"""Checkpointing: msgpack pytree snapshots with latest-resolution.

Logical contents mirror the reference's torch.save dict (actor_critic,
estimator, discriminator, optimizer states, normalizers, iteration —
bbc/rsl_rl/runners/on_policy_runner.py:306-339), stored as one flax-
serialized pytree.  The BBC->TSC weight handoff (tsc loads the frozen BBC
policy + discriminator + normalizer) is a first-class artifact: `save` /
`load` work on any pytree, and `load_into` restores into a template with
matching structure.
"""
from __future__ import annotations

import os
import re
from typing import Any, Optional

import flax.serialization as ser


def save(path: str, pytree: Any, step: Optional[int] = None) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if step is not None:
        base, ext = os.path.splitext(path)
        path = f"{base}_{step}{ext or '.msgpack'}"
    with open(path, "wb") as f:
        f.write(ser.to_bytes(pytree))
    return path


def load_into(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        return ser.from_bytes(template, f.read())


def load_into_strict(path: str, template: Any) -> Any:
    """load_into + leaf-shape validation (flax's from_bytes restores
    whatever array shapes are stored; a resume artifact from a different
    config must be rejected, not silently accepted)."""
    import jax
    import numpy as np

    restored = load_into(path, template)
    for a, b in zip(jax.tree_util.tree_leaves(template),
                    jax.tree_util.tree_leaves(restored)):
        if np.shape(a) != np.shape(b):
            raise ValueError(
                f"checkpoint leaf shape {np.shape(b)} != expected {np.shape(a)}")
    return restored


def step_of(path: str) -> Optional[int]:
    """Step number from a `<prefix>_<step>.msgpack` filename (None if
    un-suffixed).  Used as a resume fallback for artifacts whose stored
    iteration predates mid-run iteration tracking (runner.py learn)."""
    m = re.search(r"_(\d+)\.msgpack$", os.path.basename(path))
    return int(m.group(1)) if m else None


def sibling_state(model_path: str) -> Optional[str]:
    """Full-TrainState artifact saved next to a slim model checkpoint
    (model_<step>.msgpack -> state_<step>.msgpack).  Returns None if the run
    predates full-state saving (slim-only restore still works)."""
    d, name = os.path.split(model_path)
    if not name.startswith("model"):
        return None
    p = os.path.join(d, "state" + name[len("model"):])
    return p if os.path.exists(p) else None


def prune(log_dir: str, prefix: str = "model", keep_latest: int = 5,
          keep_every: int = 0) -> int:
    """Delete old step-suffixed artifacts of `prefix`, keeping the newest
    `keep_latest` and (if keep_every > 0) every step multiple of
    `keep_every`.  Long runs save every 100 iterations (reference cadence,
    bbc/…/legged_robot_config.py:224 save_interval); without rotation a
    200k-iteration campaign writes thousands of files (full-state
    artifacts are ~hundreds of MB each).  Returns the number removed."""
    if not os.path.isdir(log_dir):
        return 0
    pat = re.compile(rf"{re.escape(prefix)}_(\d+)\.msgpack$")
    steps = sorted(
        (int(m.group(1)), m.group(0))
        for m in (pat.match(n) for n in os.listdir(log_dir)) if m)
    removed = 0
    for step, name in steps[:-keep_latest] if keep_latest else steps:
        if keep_every and step % keep_every == 0:
            continue
        os.remove(os.path.join(log_dir, name))
        removed += 1
    return removed


def latest(log_dir: str, prefix: str = "model") -> Optional[str]:
    """Resolve the newest checkpoint like the reference's get_load_path
    (bbc/legged_gym/utils/helpers.py:78-99)."""
    if not os.path.isdir(log_dir):
        return None
    best, best_step = None, -1
    pat = re.compile(rf"{re.escape(prefix)}(?:_(\d+))?\.msgpack$")
    for name in os.listdir(log_dir):
        m = pat.match(name)
        if m:
            step = int(m.group(1) or 0)
            if step > best_step:
                best, best_step = os.path.join(log_dir, name), step
    return best
