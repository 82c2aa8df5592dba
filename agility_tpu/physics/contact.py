"""Contact detection and resolution (single env; vmapped by the engine).

Two interchangeable solvers over the same sphere-vs-heightfield detection:

* `pgs_solve` — the default: an impulse-space projected block Gauss-Seidel
  sweep over per-contact 3x3 blocks (normal + friction-cone projection, i.e.
  the per-env small QP/LCP block of BASELINE.json's north star).  Plays the
  role of PhysX TGS (reference sim config solver_type=1,
  num_position_iterations=4, bbc/.../legged_robot_config.py:179-190).
* `soft_forces` — a fully parallel compliant contact model (spring-damper
  normal + cone-clamped viscous friction), useful as a cheap fallback and
  for differentiability studies.

All shapes are static: every collision sphere is always a "contact" with an
activity mask, so the whole solve is branch-free under jit.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from agility_tpu.physics import heightfield as hf
from agility_tpu.physics.constants import ModelConsts
from agility_tpu.physics.dynamics import MassFactors, _inv3, solve_mass
from agility_tpu.physics.kinematics import LinkState, points_jacobian


class Contacts(NamedTuple):
    phi: jnp.ndarray        # (S,) signed distance (negative = penetrating)
    frame: jnp.ndarray      # (S, 3, 3) rows [t1, t2, n] world
    Jc: jnp.ndarray         # (S, 3, nv) contact-frame point Jacobian
    centers: jnp.ndarray    # (S, 3)


def detect(mc: ModelConsts, ls: LinkState, axes_w, grid: hf.HeightGrid,
           hf_weights=None) -> Contacts:
    """Sphere-vs-heightfield narrow phase + contact frames + Jacobians."""
    S = len(mc.sph_radius)
    sl = mc.sph_link
    off_w = _rotate_rows(ls.quat[sl], mc.sph_offset)
    centers = ls.pos[sl] + off_w                               # (S, 3)
    h = hf.sample_height(grid, centers[:, 0], centers[:, 1], hf_weights)
    n = hf.sample_normal(grid, centers[:, 0], centers[:, 1], hf_weights)
    # distance along the surface normal from the (locally planar) surface
    phi = (centers[:, 2] - h) * n[:, 2] - mc.sph_radius
    # tangent basis: t1 = normalize(x - (x.n)n) (x never parallel to n for
    # walkable terrain), t2 = n x t1
    ex = jnp.zeros_like(n).at[:, 0].set(1.0)
    t1 = ex - n * n[:, 0:1]
    t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True)
    t2 = jnp.cross(n, t1)
    frame = jnp.stack([t1, t2, n], axis=1)                     # (S, 3, 3)
    # point Jacobians at contact points (sphere surface ~ center; the radius
    # lever along n is negligible for our sphere sizes)
    Jp = points_jacobian(mc, ls, axes_w, sl, centers)          # (S, 3, nv)
    Jc = frame @ Jp                                            # (S, 3, nv)
    return Contacts(phi=phi, frame=frame, Jc=Jc, centers=centers)


def _rotate_rows(q, v):
    from agility_tpu.core.quat import quat_rotate

    return quat_rotate(q, v)


def pgs_solve(
    con: Contacts,
    factors: MassFactors,
    u_free: jnp.ndarray,
    mu,
    dt: float,
    iters: int = 4,
    baumgarte: float = 0.2,
    slop: float = 0.002,
    max_depen_vel: float = 1.0,
    restitution: float = 0.0,
):
    """Projected block Gauss-Seidel over contact impulses.

    Solves for lambda (S, 3) in the contact frame s.t.
      v+ = Jc (u_free + Minv Jc^T lambda)
      0 <= lambda_n  ⟂  v_n+ + bias >= 0,   |lambda_t| <= mu lambda_n
    Returns (u_new, lambda, force_world (S,3)).
    """
    S = con.phi.shape[0]
    nv = u_free.shape[0]
    active = (con.phi < 0.0).astype(u_free.dtype)              # (S,)

    # Minv Jc^T: (nv, 3S) via one structured solve with 3S rhs
    JcT = con.Jc.reshape(S * 3, nv).T                          # (nv, 3S)
    MinvJcT = solve_mass(factors, JcT).reshape(nv, S, 3)
    MinvJcT = jnp.swapaxes(MinvJcT, 0, 1)                      # (S, nv, 3)
    # per-contact Delassus blocks + regularized inverses
    G = con.Jc @ MinvJcT                                       # (S, 3, 3)
    eye = jnp.eye(3, dtype=u_free.dtype)
    Ginv = _inv3(G + 1e-6 * eye)

    # velocity bias: Baumgarte push-out (capped) minus restitution
    depth = jnp.maximum(-con.phi - slop, 0.0)
    bias_n = jnp.minimum(baumgarte / dt * depth, max_depen_vel)
    v0_n = (con.Jc @ u_free[:, None])[:, 2, 0]
    bias_n = bias_n + restitution * jnp.maximum(-v0_n, 0.0)
    bias = jnp.zeros((S, 3), u_free.dtype).at[:, 2].set(bias_n)

    lam0 = jnp.zeros((S, 3), u_free.dtype)

    def sweep(_, carry):
        u, lam = carry
        for s in range(S):
            v = con.Jc[s] @ u - bias[s]                        # (3,)
            dlam = -(Ginv[s] @ v)
            new = lam[s] + dlam
            ln = jnp.maximum(new[2], 0.0) * active[s]
            lt = new[:2]
            tn = jnp.linalg.norm(lt)
            scale = jnp.minimum(1.0, mu * ln / jnp.maximum(tn, 1e-9))
            new = jnp.concatenate([lt * scale * active[s], ln[None]])
            u = u + MinvJcT[s] @ (new - lam[s])
            lam = lam.at[s].set(new)
        return u, lam

    u_new, lam = jax.lax.fori_loop(0, iters, sweep, (u_free, lam0), unroll=True)
    # world-frame contact force per sphere (impulse / dt)
    force_w = jnp.einsum("sab,sa->sb", con.frame, lam) / dt
    return u_new, lam, force_w


def jacobi_solve(
    con: Contacts,
    factors: MassFactors,
    u_free: jnp.ndarray,
    mu,
    dt: float,
    iters: int = 10,
    relax: float = 0.35,
    baumgarte: float = 0.2,
    slop: float = 0.002,
    max_depen_vel: float = 1.0,
    restitution: float = 0.0,
):
    """Block-preconditioned projected Jacobi on the full contact LCP.

    TPU-friendly variant of `pgs_solve`: every iteration is one batched
    (3S x 3S) Delassus matvec + a parallel per-contact 3x3 block solve with
    friction-cone projection and under-relaxation — no sequential sweep over
    contacts, so the whole solve is ~`iters` fused ops instead of S*iters.
    Converges to the same fixed point as Gauss-Seidel for our contact counts
    (validated against pgs_solve in tests/test_contact.py).
    """
    S = con.phi.shape[0]
    nv = u_free.shape[0]
    dt_ = u_free.dtype
    active = (con.phi < 0.0).astype(dt_)

    JcT = con.Jc.reshape(S * 3, nv).T
    MinvJcT_flat = solve_mass(factors, JcT)                    # (nv, 3S)
    G_full = con.Jc.reshape(S * 3, nv) @ MinvJcT_flat          # (3S, 3S)
    Gblk = G_full.reshape(S, 3, S, 3)
    diag = Gblk[jnp.arange(S), :, jnp.arange(S), :]            # (S, 3, 3)
    eye = jnp.eye(3, dtype=dt_)
    Dinv = _inv3(diag + 1e-6 * eye)

    depth = jnp.maximum(-con.phi - slop, 0.0)
    bias_n = jnp.minimum(baumgarte / dt * depth, max_depen_vel)
    v_free = (con.Jc.reshape(S * 3, nv) @ u_free).reshape(S, 3)
    bias_n = bias_n + restitution * jnp.maximum(-v_free[:, 2], 0.0)
    bias = jnp.zeros((S, 3), dt_).at[:, 2].set(bias_n)

    def project(lam):
        ln = jnp.maximum(lam[:, 2], 0.0) * active
        lt = lam[:, :2]
        tn = jnp.linalg.norm(lt, axis=-1)
        scale = jnp.minimum(1.0, mu * ln / jnp.maximum(tn, 1e-9))
        return jnp.concatenate([lt * (scale * active)[:, None], ln[:, None]], axis=-1)

    def body(lam, _):
        v = v_free + (G_full @ lam.reshape(-1)).reshape(S, 3) - bias
        dlam = -jnp.einsum("sab,sb->sa", Dinv, v)
        lam = project(lam + relax * dlam)
        return lam, None

    lam, _ = jax.lax.scan(body, jnp.zeros((S, 3), dt_), None, length=iters)
    u_new = u_free + MinvJcT_flat @ lam.reshape(-1)
    force_w = jnp.einsum("sab,sa->sb", con.frame, lam) / dt
    return u_new, lam, force_w


def soft_forces(
    con: Contacts,
    u: jnp.ndarray,
    mu,
    kn: float = 5000.0,
    cn: float = 150.0,
    kt: float = 500.0,
):
    """Compliant contact: normal spring-damper + cone-clamped viscous
    friction.  Returns world-frame force per sphere (S, 3); fully parallel."""
    v = (con.Jc @ u[:, None])[..., 0]                          # (S, 3) contact frame
    depth = jnp.maximum(-con.phi, 0.0)
    fn = jnp.maximum(kn * depth - cn * v[:, 2] * (depth > 0), 0.0)
    vt = v[:, :2]
    ft_raw = -kt * vt * depth[:, None] * 50.0                  # stiff viscous
    tn = jnp.linalg.norm(ft_raw, axis=-1, keepdims=True)
    ft = ft_raw * jnp.minimum(1.0, mu * fn[:, None] / jnp.maximum(tn, 1e-9))
    f_con = jnp.concatenate([ft, fn[:, None]], axis=-1)        # contact frame
    return jnp.einsum("sab,sa->sb", con.frame, f_con)          # world
