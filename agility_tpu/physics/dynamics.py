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

import jax
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


def limit_impulses(mc, f: MassFactors, u: jnp.ndarray, dof_pos: jnp.ndarray,
                   dt: float, *, iters: int = 6, relax: float = 0.8,
                   max_correction_vel: float = 1.0) -> jnp.ndarray:
    """Momentum-consistent joint position/velocity limit enforcement.

    Replaces the post-integration hard clamp (clip dof_pos, zero qd), which
    deleted limb momentum with no reaction on the rest of the tree.  That
    made the clamp an unphysical momentum source: measured |dP| up to
    7 kg m/s per substep with joints at the velocity limit (vs m*g*dt =
    0.74) — the channel the r4 trot policy pumped to 95 m/s ballistic
    flight (tools/diagnose_gait.py).  PhysX resolves dof limits inside its
    TGS solver, i.e. physically; this is our equivalent.

    Limit violations are resolved by joint-space impulses mapped through
    M^-1: u' = u + M^-1 J^T j with J = unit rows of the violating dofs.
    Internal impulses cannot change total momentum — (M du)[:3,4,5] =
    (J^T j)[:6] = 0 — so momentum changes only via real external forces.

    Uses a frozen active set (dofs whose next-step position or current
    velocity violates the box) and solves the bilateral equality to the
    clamp target with diagonally-preconditioned Jacobi on the joint block
    of M^-1, assembled from the existing factors:
        A_jj = blockdiag(D^-1) + W^T S^-1 W,   W = B D^-1.
    Couplings (hip-thigh-calf, and base-mediated leg-leg) are small but
    real; 6 sweeps land within ~1e-3 rad/s of the target.  A final safety
    clamp in the integrator catches dofs pushed out of the box by the
    frozen-set approximation; its leak is orders of magnitude below the
    old direct clamp (tests/test_dynamics.py momentum gates).
    """
    qd = u[6:]
    vl = mc.dof_velocity_limit
    # box on qd: stay inside position limits after dt, and inside +-vl;
    # out-of-box positions are pushed back at <= max_correction_vel
    lo = jnp.maximum(-vl, jnp.minimum((mc.dof_limit_lower - dof_pos) / dt,
                                      max_correction_vel))
    hi = jnp.minimum(vl, jnp.maximum((mc.dof_limit_upper - dof_pos) / dt,
                                     -max_correction_vel))
    target = jnp.clip(qd, lo, hi)
    need = target - qd                                     # (12,)
    active = (jnp.abs(need) > 0.0).astype(u.dtype)

    W = jnp.concatenate(list(f.BDinv), axis=1)             # (6, 12)
    SinvW = f.Sinv @ W                                     # (6, 12)

    def A_mul(j):
        """A_jj @ j without materializing A_jj."""
        dj = (f.Dinv @ j.reshape(4, 3, 1)).reshape(12)
        return dj + W.T @ (SinvW @ j)

    diag = (jnp.concatenate([jnp.diagonal(f.Dinv[k]) for k in range(4)])
            + jnp.sum(W * SinvW, axis=0))

    def sweep(j, _):
        j2 = j + relax * (need - A_mul(j)) / diag
        return j2 * active, None

    j, _ = jax.lax.scan(sweep, jnp.zeros_like(qd), None, length=iters)

    base_du = -(SinvW @ j)                                 # (6,)
    joint_du = (f.Dinv @ j.reshape(4, 3, 1)).reshape(12) + W.T @ (f.Sinv @ (W @ j))
    return u + jnp.concatenate([base_du, joint_du])


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
