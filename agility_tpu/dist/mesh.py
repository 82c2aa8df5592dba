"""Device-mesh sharding for env-axis data parallelism.

The reference is single-GPU (SURVEY.md §5: no distributed backend; the
--horovod flag is dead code).  Here multi-chip is first-class: envs are
embarrassingly parallel, so the one strategy the workload needs is a 1-D
`("env",)` mesh with every (N, ...) leaf sharded along the env axis and
parameters replicated.  Everything runs through GSPMD: `train_iteration` is
jitted once with sharded inputs; XLA inserts the psum for globally-reduced
quantities (advantage normalization, metric means) over ICI.

Multi-host: call `jax.distributed.initialize()` before building the mesh —
`jax.devices()` then spans all hosts and the same code sharding applies
across DCN/ICI transparently.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), ("env",))


def env_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("env"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_tree(tree: Any, mesh: Mesh, num_envs: int) -> Any:
    """Place every leaf whose leading axis == num_envs on the env axis;
    replicate everything else (scalars, global params, PRNG keys)."""
    es = env_sharding(mesh)
    rep = replicated(mesh)

    def place(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] == num_envs:
            return jax.device_put(x, es)
        return jax.device_put(x, rep)

    return jax.tree.map(place, tree)


def replicate_tree(tree: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), rep), tree)
