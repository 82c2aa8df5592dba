"""Batched articulated rigid-body dynamics.

Formulation: projected Newton-Euler ("Jacobian-space CRBA") in world-frame
coordinates with generalized velocity u = [v_base_w, w_base_w, qd].

  M(q)  = sum_l  m_l Jv_l^T Jv_l  +  Jw_l^T I_l^w Jw_l
  C(q,u)= sum_l  Jv_l^T m_l a_com_l|u'=0  +  Jw_l^T (I_l^w alpha_l|u'=0
                                                     + w_l x I_l^w w_l)
  M u' = tau_gen - C        (gravity folded into C via a -g base acceleration)

For a 13-link tree these are small dense einsums that batch into MXU matmuls
under vmap — the TPU-native replacement for PhysX's forward dynamics
(the reference leans on IsaacGym `gym.simulate`, bbc/.../legged_robot.py:105).

The linear solves exploit quadruped branch-induced sparsity: with dof order
[base(6), leg0(3), leg1(3), leg2(3), leg3(3)], legs do not couple to each
other, so M factorizes as four 3x3 leg blocks plus a 6x6 base Schur
complement — O(1) depth, closed-form 3x3 inverses, one tiny 6x6 inverse.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from agility_tpu.core import quat as qm
from agility_tpu.physics.constants import ModelConsts
from agility_tpu.physics.kinematics import LinkState, com_jacobians


def world_inertia(mc: ModelConsts, ls: LinkState) -> jnp.ndarray:
    """(L, 3, 3) link rotational inertia about COM in world frame."""
    R = qm.quat_to_rotmat(ls.quat)                       # (L, 3, 3)
    return R @ mc.link_inertia @ jnp.swapaxes(R, -1, -2)


def mass_matrix(mc: ModelConsts, ls: LinkState, axes_w) -> jnp.ndarray:
    """(nv, nv) joint-space inertia matrix."""
    Jv, Jw = com_jacobians(mc, ls, axes_w)               # (L, 3, nv)
    Iw = world_inertia(mc, ls)
    M = jnp.einsum("l,lai,laj->ij", mc.link_mass, Jv, Jv)
    M = M + jnp.einsum("lai,lab,lbj->ij", Jw, Iw, Jw)
    return M


def bias_forces(mc: ModelConsts, ls: LinkState, axes_w, qdj, gravity) -> jnp.ndarray:
    """(nv,) generalized bias C(q,u): Coriolis/centrifugal + gravity.

    Propagates accelerations down the tree with u' = 0 and a fictitious base
    acceleration of -gravity (the classic RNEA gravity trick), then projects
    the resulting inertial forces through the COM Jacobians.
    """
    L = mc.n_links
    alpha = [None] * L
    a_frame = [None] * L
    alpha[0] = jnp.zeros(3, dtype=ls.pos.dtype)
    a_frame[0] = -gravity
    for l in range(1, L):
        p = int(mc.parent[l])
        d = l - 1
        r = ls.pos[l] - ls.pos[p]
        a_frame[l] = (
            a_frame[p]
            + jnp.cross(alpha[p], r)
            + jnp.cross(ls.omega[p], jnp.cross(ls.omega[p], r))
        )
        # d/dt(axis_w * qd) with qdd=0:  (w_p x axis_w) qd
        alpha[l] = alpha[p] + jnp.cross(ls.omega[p], axes_w[d]) * qdj[d]
    alpha = jnp.stack(alpha)                              # (L, 3)
    a_frame = jnp.stack(a_frame)                          # (L, 3)
    c = ls.com - ls.pos
    a_com = (
        a_frame
        + jnp.cross(alpha, c)
        + jnp.cross(ls.omega, jnp.cross(ls.omega, c))
    )
    Iw = world_inertia(mc, ls)
    f = mc.link_mass[:, None] * a_com                     # (L, 3)
    n = jnp.einsum("lab,lb->la", Iw, alpha) + jnp.cross(
        ls.omega, jnp.einsum("lab,lb->la", Iw, ls.omega)
    )
    Jv, Jw = com_jacobians(mc, ls, axes_w)
    return jnp.einsum("lai,la->i", Jv, f) + jnp.einsum("lai,la->i", Jw, n)


# ---------------------------------------------------------------------------
# Structured PD solve: base(6) + 4 independent leg(3) blocks
# ---------------------------------------------------------------------------


class MassFactors(NamedTuple):
    """Explicit inverse factors of M for repeated application (PGS sweeps)."""
    Dinv: jnp.ndarray   # (4, 3, 3)  inverse leg blocks
    B: jnp.ndarray      # (4, 6, 3)  base-leg coupling blocks
    Sinv: jnp.ndarray   # (6, 6)     inverse base Schur complement
    BDinv: jnp.ndarray  # (4, 6, 3)  B @ Dinv (cached)


def _inv3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched 3x3 inverse (adjugate / det)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    adj = jnp.stack(
        [A11, A12, A13, A21, A22, A23, A31, A32, A33], axis=-1
    ).reshape(A.shape)
    return adj / det[..., None, None]


def _inv6(A: jnp.ndarray) -> jnp.ndarray:
    """6x6 SPD inverse via 3x3 block Schur (avoids generic LU on TPU)."""
    P = A[..., :3, :3]
    Q = A[..., :3, 3:]
    S = A[..., 3:, 3:]
    Pinv = _inv3(P)
    QtPinv = jnp.swapaxes(Q, -1, -2) @ Pinv
    Sc = S - QtPinv @ Q
    Scinv = _inv3(Sc)
    TL = Pinv + Pinv @ Q @ Scinv @ QtPinv
    TR = -Pinv @ Q @ Scinv
    BL = jnp.swapaxes(TR, -1, -2)
    top = jnp.concatenate([TL, TR], axis=-1)
    bot = jnp.concatenate([BL, Scinv], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def factor_mass_matrix(M: jnp.ndarray) -> MassFactors:
    """Factor M (18x18, quadruped dof ordering) for fast repeated solves."""
    A = M[:6, :6]
    B = M[:6, 6:].reshape(6, 4, 3).transpose(1, 0, 2)     # (4, 6, 3)
    # leg diagonal blocks
    D = jnp.stack([M[6 + 3 * k : 9 + 3 * k, 6 + 3 * k : 9 + 3 * k] for k in range(4)])
    Dinv = _inv3(D)                                       # (4, 3, 3)
    BDinv = B @ Dinv                                      # (4, 6, 3)
    S = A - jnp.einsum("kab,kcb->ac", BDinv, B)
    return MassFactors(Dinv=Dinv, B=B, Sinv=_inv6(S), BDinv=BDinv)


def solve_mass(f: MassFactors, rhs: jnp.ndarray) -> jnp.ndarray:
    """x = M^-1 rhs; rhs is (18,) or (18, m)."""
    vec = rhs.ndim == 1
    r = rhs[:, None] if vec else rhs                      # (18, m)
    rb = r[:6]                                            # (6, m)
    rl = r[6:].reshape(4, 3, -1)                          # (4, 3, m)
    y = f.Dinv @ rl                                       # (4, 3, m)
    xb = f.Sinv @ (rb - jnp.einsum("kab,kbm->am", f.BDinv, rl))
    xl = y - f.Dinv @ jnp.einsum("kab,am->kbm", f.B, xb)  # (4, 3, m)
    x = jnp.concatenate([xb, xl.reshape(12, -1)], axis=0)
    return x[:, 0] if vec else x
