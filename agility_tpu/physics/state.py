"""Simulation state pytree.

The JAX-native replacement for the reference's gymtorch tensor views (root
states (N,13), dof states (N,12,2), rigid-body states (N,B,13), net contact
forces (N,B,3) — bbc/legged_gym/envs/base/legged_robot.py:746-770).  All
leaves have a leading env axis; the whole pytree shards along it.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class SimState(NamedTuple):
    # generalized coordinates
    base_pos: jnp.ndarray        # (N, 3)
    base_quat: jnp.ndarray       # (N, 4) xyzw
    dof_pos: jnp.ndarray         # (N, nu)
    # generalized velocity (world-frame base twist)
    base_lin_vel: jnp.ndarray    # (N, 3)
    base_ang_vel: jnp.ndarray    # (N, 3)
    dof_vel: jnp.ndarray         # (N, nu)
    # outputs refreshed by the engine after every control step
    body_pos: jnp.ndarray        # (N, B, 3)
    body_quat: jnp.ndarray       # (N, B, 4)
    body_vel: jnp.ndarray        # (N, B, 3)
    body_ang_vel: jnp.ndarray    # (N, B, 3)
    contact_forces: jnp.ndarray  # (N, B, 3) net contact force per body [N]
    torques: jnp.ndarray         # (N, nu) last applied joint torques

    @property
    def root_states(self) -> jnp.ndarray:
        """(N, 13) isaac-layout root state [pos, quat, lin vel, ang vel]."""
        return jnp.concatenate(
            [self.base_pos, self.base_quat, self.base_lin_vel, self.base_ang_vel],
            axis=-1,
        )


def zero_state(n_envs: int, nu: int, n_bodies: int, dtype=jnp.float32) -> SimState:
    z = lambda *s: jnp.zeros((n_envs,) + s, dtype)
    quat = z(4).at[:, 3].set(1.0)
    bquat = z(n_bodies, 4).at[:, :, 3].set(1.0)
    return SimState(
        base_pos=z(3),
        base_quat=quat,
        dof_pos=z(nu),
        base_lin_vel=z(3),
        base_ang_vel=z(3),
        dof_vel=z(nu),
        body_pos=z(n_bodies, 3),
        body_quat=bquat,
        body_vel=z(n_bodies, 3),
        body_ang_vel=z(n_bodies, 3),
        contact_forces=z(n_bodies, 3),
        torques=z(nu),
    )
