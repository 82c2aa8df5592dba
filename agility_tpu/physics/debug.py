"""Numerical-health debugging for the engine (SURVEY.md §5: jax
checkify/NaN-check mode for the contact solver — JAX purity makes data races
structural non-issues, so health checking is about non-finite states).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from agility_tpu.physics.state import SimState


def state_health(sim) -> Dict[str, jnp.ndarray]:
    """Per-batch health summary of an EnvState/SimState-like pytree with
    (N, ...) leaves: count of non-finite envs, max speeds, depth of the
    lowest body.  Cheap enough to run every iteration."""
    finite = jnp.ones(sim.base_pos.shape[0], bool)
    for leaf in jax.tree_util.tree_leaves(sim):
        finite = finite & jnp.isfinite(leaf).all(
            axis=tuple(range(1, leaf.ndim)))
    return {
        "nonfinite_envs": jnp.sum(~finite),
        "max_base_speed": jnp.max(jnp.linalg.norm(sim.u[:, :3], axis=-1)),
        "max_ang_speed": jnp.max(jnp.linalg.norm(sim.u[:, 3:6], axis=-1)),
        "min_base_z": jnp.min(sim.base_pos[:, 2]),
        "max_dof_vel": jnp.max(jnp.abs(sim.u[:, 6:])),
    }


def checked(fn):
    """Wrap a jittable step function with checkify so non-finite
    intermediates raise with a location instead of silently propagating:

        err, out = physics_debug.checked(env.step)(state, actions)
        err.throw()
    """
    return checkify.checkify(
        fn, errors=checkify.float_checks | checkify.user_checks)


def assert_finite(tag: str, *arrays):
    """checkify assertion usable inside engine code when hunting NaNs."""
    for i, a in enumerate(arrays):
        checkify.check(jnp.isfinite(a).all(), f"non-finite in {tag}[{i}]")
