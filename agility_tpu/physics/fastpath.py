"""TPU-layout-optimized dynamics + contact path.

Same math as `dynamics.py`/`contact.py`, restructured for TPU tiling: the
naive formulation materializes (N, S, 3, nv) Jacobian tensors whose minor
dims (3, 18) waste most of each (8, 128) tile — measured ~10x padded HBM
traffic and ~25 ms of a 31 ms substep at 4096 envs (PERF_NOTES.md).  Here
Jacobians are built directly in transposed/flattened form (N, nv, 3S) —
minor dim 72 -> 1.8x padding — via component-planar arithmetic, and the
contact LCP runs in the *world* frame (cone projection against the contact
normal), eliminating the per-contact frame rotation entirely.

Exact same fixed points as the reference path; equivalence is asserted in
tests/test_fastpath.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from agility_tpu.core import quat as qm
from agility_tpu.physics import heightfield as hf
from agility_tpu.physics.constants import ModelConsts
from agility_tpu.physics.dynamics import MassFactors, _inv3, factor_mass_matrix, solve_mass
from agility_tpu.physics.kinematics import LinkState


def _jacobian_T(mc: ModelConsts, ls: LinkState, axes_w, link_idx, points_w):
    """Linear-velocity Jacobian, transposed+flattened: (nv, 3P) for P world
    points attached to links.  Column (p, a) is d v_p[a] / d u.

    Rows: [0:3] base linear (identity pattern), [3:6] base angular
    (epsilon r), [6:] joints (mask * (axis x (point - joint_origin)))."""
    P = points_w.shape[0]
    nu = mc.nu
    dt_ = points_w.dtype

    # rows 0:3 — identity per point: (3, P, 3)
    top = jnp.broadcast_to(jnp.eye(3, dtype=dt_)[:, None, :], (3, P, 3))

    # rows 3:6 — v_p = v + w x r:
    # (w x r) = (wy*rz - wz*ry, wz*rx - wx*rz, wx*ry - wy*rx)
    # -> mid[i, p, a] = d (w x r)_a / d w_i
    r = points_w - ls.pos[0]                       # (P, 3)
    z = jnp.zeros((P,), dt_)
    rx, ry, rz = r[:, 0], r[:, 1], r[:, 2]
    mid = jnp.stack([
        jnp.stack([z, -rz, ry], 0),    # i = x: (0, -rz, ry)
        jnp.stack([rz, z, -rx], 0),    # i = y: (rz, 0, -rx)
        jnp.stack([-ry, rx, z], 0),    # i = z: (-ry, rx, 0)
    ], 0)                                           # (3i, 3a, P)
    mid = jnp.transpose(mid, (0, 2, 1))             # (3i, P, 3a)

    # rows 6: — planar lever arithmetic on (P*nu,) flats
    jp = ls.pos[mc.dof_link]                        # (nu, 3)
    dx = (points_w[:, 0:1] - jp[None, :, 0]).reshape(-1)   # (P*nu,)
    dy = (points_w[:, 1:2] - jp[None, :, 1]).reshape(-1)
    dz = (points_w[:, 2:3] - jp[None, :, 2]).reshape(-1)
    ax = jnp.tile(axes_w[:, 0], (P,))
    ay = jnp.tile(axes_w[:, 1], (P,))
    az = jnp.tile(axes_w[:, 2], (P,))
    m = mc.ancestors[link_idx].reshape(-1)          # (P*nu,)
    lx = (ay * dz - az * dy) * m
    ly = (az * dx - ax * dz) * m
    lz = (ax * dy - ay * dx) * m
    lev = jnp.stack([lx, ly, lz], -1).reshape(P, nu, 3)    # (P, nu, 3)
    bot = jnp.transpose(lev, (1, 0, 2))             # (nu, P, 3)

    return jnp.concatenate([top, mid, bot], 0).reshape(6 + nu, 3 * P)


def _jacobian_w_T(mc: ModelConsts, ls: LinkState, axes_w, link_idx, P):
    """Angular-velocity Jacobian transposed: (nv, 3P)."""
    nu = mc.nu
    dt_ = ls.pos.dtype
    top = jnp.zeros((3, P, 3), dt_)
    mid = jnp.broadcast_to(jnp.eye(3, dtype=dt_)[:, None, :], (3, P, 3))
    m = mc.ancestors[link_idx]                      # (P, nu)
    bot = (m[:, :, None] * axes_w[None, :, :])      # (P, nu, 3)
    bot = jnp.transpose(bot, (1, 0, 2))             # (nu, P, 3)
    return jnp.concatenate([top, mid, bot], 0).reshape(6 + nu, 3 * P)


# ---------------------------------------------------------------------------
# dynamics
# ---------------------------------------------------------------------------


def mass_and_bias(mc: ModelConsts, ls: LinkState, axes_w, qdj, gravity):
    """(M (nv,nv), C (nv,)) with layout-friendly Jacobian contractions."""
    import numpy as np

    L = mc.n_links
    nv = mc.nv
    link_idx = np.arange(L)
    JvT = _jacobian_T(mc, ls, axes_w, link_idx, ls.com)        # (nv, 3L)
    JwT = _jacobian_w_T(mc, ls, axes_w, link_idx, L)           # (nv, 3L)

    R = qm.quat_to_rotmat(ls.quat)
    Iw = R @ mc.link_inertia @ jnp.swapaxes(R, -1, -2)         # (L, 3, 3)

    w_rep = jnp.repeat(mc.link_mass, 3)                        # (3L,)
    M = jnp.einsum("ia,ja->ij", JvT * w_rep[None, :], JvT)
    JwT_b = JwT.reshape(nv, L, 3)
    JwT_I = jnp.einsum("nla,lab->nlb", JwT_b, Iw).reshape(nv, 3 * L)
    M = M + JwT_I @ JwT.T

    # bias: propagate accelerations with u'=0 (same recursion as dynamics.py)
    alpha = [None] * L
    a_frame = [None] * L
    alpha[0] = jnp.zeros(3, ls.pos.dtype)
    a_frame[0] = -gravity
    for l in range(1, L):
        p = int(mc.parent[l])
        d = l - 1
        r = ls.pos[l] - ls.pos[p]
        a_frame[l] = (a_frame[p] + jnp.cross(alpha[p], r)
                      + jnp.cross(ls.omega[p], jnp.cross(ls.omega[p], r)))
        alpha[l] = alpha[p] + jnp.cross(ls.omega[p], axes_w[d]) * qdj[d]
    alpha = jnp.stack(alpha)
    a_frame = jnp.stack(a_frame)
    c = ls.com - ls.pos
    a_com = a_frame + jnp.cross(alpha, c) + jnp.cross(ls.omega, jnp.cross(ls.omega, c))
    f = (mc.link_mass[:, None] * a_com).reshape(-1)            # (3L,)
    n = (jnp.einsum("lab,lb->la", Iw, alpha)
         + jnp.cross(ls.omega, jnp.einsum("lab,lb->la", Iw, ls.omega))).reshape(-1)
    C = JvT @ f + JwT @ n
    return M, C


# ---------------------------------------------------------------------------
# contact
# ---------------------------------------------------------------------------


def detect_T(mc: ModelConsts, ls: LinkState, axes_w, grid: hf.HeightGrid,
             hf_weights=None, terrain_patch=None):
    """World-frame contact data: (phi (S,), normals (S,3), JpT (nv, 3S)).

    With `terrain_patch` (physics/patch.py) the height/normal queries are
    gather-free MXU contractions; otherwise they fall back to grid gathers.
    """
    sl = mc.sph_link
    off_w = qm.quat_rotate(ls.quat[sl], mc.sph_offset)
    centers = ls.pos[sl] + off_w
    if terrain_patch is not None:
        from agility_tpu.physics import patch as pt

        h, n = pt.sample_height_and_normal(terrain_patch, centers[:, 0], centers[:, 1])
    else:
        h = hf.sample_height(grid, centers[:, 0], centers[:, 1], hf_weights)
        n = hf.sample_normal(grid, centers[:, 0], centers[:, 1], hf_weights)
    phi = (centers[:, 2] - h) * n[:, 2] - mc.sph_radius
    JpT = _jacobian_T(mc, ls, axes_w, sl, centers)
    if terrain_patch is not None and terrain_patch.ceil is not None:
        # overhang rows (tunnel roof / tire top ring): the leading k base-link
        # spheres (trunk + head; soa._Consts asserts they lead) are tested
        # against the ceiling surface with downward outward normals.  The
        # contact points coincide with the floor rows' points, so their
        # Jacobian columns are reused verbatim.
        import numpy as np

        from agility_tpu.physics import patch as pt

        k = int(np.sum(np.asarray(mc.sph_link) == 0))
        ch, cn = pt.sample_ceiling_and_normal(
            terrain_patch, centers[:k, 0], centers[:k, 1])
        phi_c = (ch - centers[:k, 2]) * (-cn[:, 2]) - mc.sph_radius[:k]
        phi = jnp.concatenate([phi, phi_c])
        n = jnp.concatenate([n, cn], axis=0)
        JpT = jnp.concatenate([JpT, JpT[:, : 3 * k]], axis=1)
    return phi, n, JpT


def jacobi_solve_world(
    phi, normals, JpT, factors: MassFactors, u_free, mu, dt,
    iters=10, relax=0.6, baumgarte=0.2, slop=0.002, max_depen_vel=1.0,
    restitution=0.0, lam_max=25.0,
):
    """Projected block-Jacobi LCP in world coordinates.

    Same fixed point as contact.jacobi_solve (which iterates in per-contact
    frames): normal/tangent decomposition happens against `normals` during
    the projection instead of pre-rotating the Jacobians.
    Returns (u_new, force_world (S, 3))."""
    nv, S3 = JpT.shape
    S = S3 // 3
    dt_ = u_free.dtype
    active = (phi < 0.0).astype(dt_)

    MinvJT = solve_mass(factors, JpT)                # (nv, 3S)
    G = JpT.T @ MinvJT                               # (3S, 3S)
    Gb = G.reshape(S, 3, S, 3)
    diag = Gb[jnp.arange(S), :, jnp.arange(S), :]    # (S, 3, 3)
    Dinv = _inv3(diag + 1e-6 * jnp.eye(3, dtype=dt_))

    depth = jnp.maximum(-phi - slop, 0.0)
    bias_n = jnp.minimum(baumgarte / dt * depth, max_depen_vel)
    v_free = (JpT.T @ u_free).reshape(S, 3)
    vn0 = jnp.sum(v_free * normals, -1)
    bias_n = bias_n + restitution * jnp.maximum(-vn0, 0.0)
    bias = bias_n[:, None] * normals                 # (S, 3) world-frame bias

    def project(lam):
        ln = jnp.sum(lam * normals, -1)
        lt = lam - ln[:, None] * normals
        # impulse cap: bounds Jacobi divergence on pathological (deeply
        # interpenetrating) states — 25 kg m/s >> any legitimate stance
        # impulse at dt=5 ms, so regular dynamics are unaffected
        ln = jnp.clip(ln, 0.0, lam_max) * active
        tn = jnp.linalg.norm(lt, axis=-1)
        scale = jnp.minimum(1.0, mu * ln / jnp.maximum(tn, 1e-9)) * active
        return lt * scale[:, None] + ln[:, None] * normals

    def body(lam, _):
        v = (G @ lam.reshape(-1)).reshape(S, 3) + v_free - bias
        dlam = -jnp.einsum("sab,sb->sa", Dinv, v)
        return project(lam + relax * dlam), None

    lam, _ = jax.lax.scan(body, jnp.zeros((S, 3), dt_), None, length=iters)
    u_new = u_free + MinvJT @ lam.reshape(-1)
    return u_new, lam / dt


def soft_forces_world(phi, normals, JpT, u, mu, kn=5000.0, cn=150.0, kt=500.0):
    """World-frame compliant contact (same model as contact.soft_forces)."""
    S = phi.shape[0]
    v = (JpT.T @ u).reshape(S, 3)
    vn = jnp.sum(v * normals, -1)
    vt = v - vn[:, None] * normals
    depth = jnp.maximum(-phi, 0.0)
    fn = jnp.maximum(kn * depth - cn * vn * (depth > 0), 0.0)
    ft_raw = -kt * vt * depth[:, None] * 50.0
    tn = jnp.linalg.norm(ft_raw, axis=-1, keepdims=True)
    ft = ft_raw * jnp.minimum(1.0, mu * fn[:, None] / jnp.maximum(tn, 1e-9))
    return ft + fn[:, None] * normals
