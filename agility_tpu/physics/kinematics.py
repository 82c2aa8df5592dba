"""Batched forward kinematics, velocities, and Jacobians.

All functions are written for a *single* environment and vmapped by the
engine; under vmap every op becomes a (N, ...) element-wise VPU op or a
batched matmul on the MXU.  The tree loop is unrolled at trace time (the Go2
tree has 13 links, depth 3), so XLA sees straight-line code.

Replaces IsaacGym's rigid-body state tensors (reference
bbc/legged_gym/envs/base/legged_robot.py:746-770).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from agility_tpu.core import quat as qm
from agility_tpu.physics.constants import ModelConsts


class LinkState(NamedTuple):
    pos: jnp.ndarray        # (L, 3) link frame origin, world
    quat: jnp.ndarray       # (L, 4) link frame orientation, world, xyzw
    com: jnp.ndarray        # (L, 3) link COM, world
    # populated by `velocities`:
    omega: jnp.ndarray      # (L, 3) angular velocity, world
    vel: jnp.ndarray        # (L, 3) linear velocity of link frame origin, world
    vcom: jnp.ndarray       # (L, 3) linear velocity of COM, world


def fk(mc: ModelConsts, base_pos, base_quat, qj) -> LinkState:
    """Positions/orientations of all moving links.

    qj: (nu,) joint angles.  Returns LinkState with velocity fields zeroed.
    """
    L = mc.n_links
    pos = [None] * L
    quat = [None] * L
    pos[0], quat[0] = base_pos, base_quat
    # map link -> dof index (link l>0 is driven by dof d where dof_link[d]==l;
    # dof order == link order minus base for our tree builder)
    for l in range(1, L):
        p = int(mc.parent[l])
        d = l - 1
        jq = qm.quat_from_axis_angle(mc.joint_axis[l], qj[d])
        quat[l] = qm.quat_mul(quat[p], qm.quat_mul(mc.joint_quat[l], jq))
        pos[l] = pos[p] + qm.quat_rotate(quat[p], mc.joint_pos[l])
    pos = jnp.stack(pos)
    quat = jnp.stack(quat)
    com = pos + qm.quat_rotate(quat, mc.link_com)
    z = jnp.zeros_like(pos)
    return LinkState(pos, quat, com, z, z, z)


def velocities(mc: ModelConsts, ls: LinkState, base_lin, base_ang, qdj) -> LinkState:
    """Propagate world-frame velocities down the tree."""
    L = mc.n_links
    omega = [None] * L
    vel = [None] * L
    omega[0], vel[0] = base_ang, base_lin
    for l in range(1, L):
        p = int(mc.parent[l])
        d = l - 1
        axis_w = qm.quat_rotate(ls.quat[l], mc.joint_axis[l])
        omega[l] = omega[p] + axis_w * qdj[d]
        vel[l] = vel[p] + jnp.cross(omega[p], ls.pos[l] - ls.pos[p])
    omega = jnp.stack(omega)
    vel = jnp.stack(vel)
    vcom = vel + jnp.cross(omega, ls.com - ls.pos)
    return ls._replace(omega=omega, vel=vel, vcom=vcom)


def world_axes(mc: ModelConsts, ls: LinkState) -> jnp.ndarray:
    """(nu, 3) world-frame joint axes."""
    return qm.quat_rotate(ls.quat[mc.dof_link], mc.joint_axis[mc.dof_link])


def point_jacobian(mc: ModelConsts, ls: LinkState, axes_w, link_idx, point_w):
    """6 x nv Jacobian of a world point rigidly attached to link `link_idx`
    (static python int or array index): rows [J_v (3,nv); J_w (3,nv)],
    generalized velocity u = [v_base, w_base, qd].
    """
    nv = mc.nv
    nu = mc.nu
    r = point_w - ls.pos[0]            # moment arm from base origin
    Jv = jnp.zeros((3, nv))
    Jw = jnp.zeros((3, nv))
    Jv = Jv.at[:, 0:3].set(jnp.eye(3))
    Jv = Jv.at[:, 3:6].set(-qm.skew(r))
    Jw = Jw.at[:, 3:6].set(jnp.eye(3))
    mask = mc.ancestors[link_idx]      # (nu,)
    jp = ls.pos[mc.dof_link]           # (nu, 3) joint origins
    lever = jnp.cross(axes_w, point_w[None, :] - jp)  # (nu, 3)
    Jv = Jv.at[:, 6:].set((mask[:, None] * lever).T)
    Jw = Jw.at[:, 6:].set((mask[:, None] * axes_w).T)
    return Jv, Jw


def com_jacobians(mc: ModelConsts, ls: LinkState, axes_w):
    """Stacked COM Jacobians for all links: Jv, Jw of shape (L, 3, nv)."""
    nv = mc.nv
    L = mc.n_links
    r = ls.com - ls.pos[0]                         # (L, 3)
    eye = jnp.broadcast_to(jnp.eye(3), (L, 3, 3))
    base_v = jnp.concatenate([eye, -qm.skew(r)], axis=-1)        # (L, 3, 6)
    zeros3 = jnp.zeros((L, 3, 3))
    base_w = jnp.concatenate([zeros3, eye], axis=-1)             # (L, 3, 6)
    mask = mc.ancestors                             # (L, nu)
    jp = ls.pos[mc.dof_link]                        # (nu, 3)
    # lever[l, d] = axes_w[d] x (com[l] - jp[d])
    lever = jnp.cross(axes_w[None, :, :], ls.com[:, None, :] - jp[None, :, :])  # (L, nu, 3)
    Jv_j = jnp.swapaxes(mask[:, :, None] * lever, 1, 2)          # (L, 3, nu)
    Jw_j = jnp.swapaxes(mask[:, :, None] * axes_w[None], 1, 2)   # (L, 3, nu)
    Jv = jnp.concatenate([base_v, Jv_j], axis=-1)                # (L, 3, nv)
    Jw = jnp.concatenate([base_w, Jw_j], axis=-1)
    return Jv, Jw


def points_jacobian(mc: ModelConsts, ls: LinkState, axes_w, link_idx, points_w):
    """Vectorized linear-velocity Jacobians for a set of world points rigidly
    attached to links: link_idx (P,) numpy, points_w (P, 3) -> (P, 3, nv)."""
    P = points_w.shape[0]
    r = points_w - ls.pos[0]                                   # (P, 3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=points_w.dtype), (P, 3, 3))
    base = jnp.concatenate([eye, -qm.skew(r)], axis=-1)        # (P, 3, 6)
    mask = mc.ancestors[link_idx]                              # (P, nu)
    jp = ls.pos[mc.dof_link]                                   # (nu, 3)
    lever = jnp.cross(axes_w[None, :, :], points_w[:, None, :] - jp[None, :, :])
    Jj = jnp.swapaxes(mask[:, :, None] * lever, 1, 2)          # (P, 3, nu)
    return jnp.concatenate([base, Jj], axis=-1)                # (P, 3, nv)


def body_states(mc: ModelConsts, ls: LinkState):
    """Reported rigid-body states: pos (B,3), quat (B,4), vel (B,3), omega
    (B,3) — the layout of the reference's rigid_body_state tensor
    (legged_robot.py:759-768)."""
    bl = mc.body_link
    off_w = qm.quat_rotate(ls.quat[bl], mc.body_offset)
    pos = ls.pos[bl] + off_w
    quat = ls.quat[bl]
    omega = ls.omega[bl]
    vel = ls.vel[bl] + jnp.cross(omega, off_w)
    return pos, quat, vel, omega


def sphere_centers(mc: ModelConsts, ls: LinkState):
    """World centers (S, 3) and velocities (S, 3) of collision spheres."""
    sl = mc.sph_link
    off_w = qm.quat_rotate(ls.quat[sl], mc.sph_offset)
    centers = ls.pos[sl] + off_w
    vels = ls.vel[sl] + jnp.cross(ls.omega[sl], off_w)
    return centers, vels
