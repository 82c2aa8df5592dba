"""Deployment export of trained policies.

The reference exports policies as TorchScript for on-robot inference
(export_policy_as_jit, bbc/legged_gym/utils/helpers.py:233-271).  The
TPU-native counterpart serializes the jitted inference function as a
portable StableHLO artifact via `jax.export` — loadable from any JAX
process (CPU/GPU/TPU) without the framework, plus a plain-numpy `.npz`
of the parameters for non-JAX runtimes.
"""
from __future__ import annotations

import os
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def export_policy(policy_fn: Callable, example_inputs: Sequence, out_path: str) -> str:
    """Serialize `jax.jit(policy_fn)` at the example input shapes to
    `<out_path>.stablehlo`."""
    from jax import export as jexport

    exported = jexport.export(jax.jit(policy_fn))(*example_inputs)
    blob = exported.serialize()
    path = out_path if out_path.endswith(".stablehlo") else out_path + ".stablehlo"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_policy(path: str) -> Callable:
    """Deserialize an exported policy; returns a callable."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return lambda *args: exported.call(*args)


def export_params_npz(params, out_path: str) -> str:
    """Flat numpy dump of a parameter pytree (keys are pytree paths) for
    non-JAX deployment runtimes."""
    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        key = jax.tree_util.keystr(path)
        flat[key] = np.asarray(leaf)
    path = out_path if out_path.endswith(".npz") else out_path + ".npz"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)
    return path
