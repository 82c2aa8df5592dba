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


# Physical envelope for a torque-limited Go2 (15 kg, hip 23.7 / thigh 23.7 /
# calf 45 Nm, 30 rad/s dof velocity cap): real hardware tops out at
# ~3.7-5 m/s.  A sim policy sustaining base speeds beyond this gate is
# exploiting the integrator/contact model, not locomoting (the r4 "trot"
# reached 95 m/s by pumping the momentum-deleting joint-limit clamp —
# fixed by dynamics.limit_impulses; this gate exists so any future
# energy-injection channel is caught by the health monitor, not by a
# 100k-iteration campaign).
GO2_SPEED_GATE = 8.0


def speed_gate(sim, gate: float = GO2_SPEED_GATE) -> Dict[str, jnp.ndarray]:
    """Exploit detector: fraction of envs whose base speed exceeds the
    physical ceiling, plus the max.  Log alongside state_health during
    training; a non-zero fraction sustained over iterations means the
    policy found an energy leak."""
    speed = jnp.linalg.norm(sim.u[:, :3], axis=-1)
    return {
        "overspeed_frac": jnp.mean((speed > gate).astype(jnp.float32)),
        "max_base_speed": jnp.max(speed),
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
