"""Batch-last ("structure of arrays") physics path.

The vmapped engine (engine.py / fastpath.py) carries every quantity with the
env axis MAJOR — (N, 3), (N, 4), (N, 18, 72) — so the tiny structural dims
land in the TPU lane axis and each (8, 128) tile is mostly padding (measured
~10-40x wasted HBM bytes, PERF_NOTES.md).  This module recomputes the exact
same substep with the env axis MINOR: states are (3, N)/(4, N)/(12, N),
link quantities are unrolled python lists of (N,) component arrays, contact
tensors are (S, N) and (12, 3, S, N).  Every elementwise op then runs on
full (8, 128) tiles and XLA fuses the chains.

Same math, different layout:
  - FK / velocities: component arithmetic unrolled over the 13-link tree.
  - Mass matrix: composite-rigid-body algorithm about the *base origin*
    (world-origin spatial algebra would lose precision at |r|~40 m terrain
    coordinates) — composites are plain 10-parameter sums, no Jacobian
    contraction, no (N, 18, 18) tensors.
  - Bias forces: the same u'=0 acceleration propagation + subtree force
    accumulation (RNEA-style) instead of Jacobian projection.
  - Contact: matrix-free projected block-Jacobi — G = J M^-1 J^T is never
    materialized; each sweep applies J^T, the structured mass solve, and J.

Equivalence with the vmapped oracle is asserted in tests/test_soa.py.
Replaces the reference's PhysX step (bbc/legged_gym/envs/base/
legged_robot.py:99-115) like engine.py, at TPU speed of light.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from agility_tpu.physics import heightfield as hf
from agility_tpu.physics.constants import ModelConsts
from agility_tpu.physics.state import SimState  # noqa: F401  (API parity)

# ---------------------------------------------------------------------------
# component-tuple helpers: Vec3 = (x, y, z), Quat = (x, y, z, w); entries are
# arrays of any (broadcast-compatible) shape, typically (N,) or (S, N)
# ---------------------------------------------------------------------------


def v_add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def v_sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def v_scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def v_dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def v_cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def q_mul(a, b):
    ax, ay, az, aw = a
    bx, by, bz, bw = b
    return (aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
            aw * bw - ax * bx - ay * by - az * bz)


def q_rot(q, v):
    """Rotate vector tuple v by quat tuple q (xyzw)."""
    u = (q[0], q[1], q[2])
    w = q[3]
    t = v_scale(v_cross(u, v), 2.0)
    return v_add(v, v_add(v_scale(t, w), v_cross(u, t)))


def q_rotmat(q):
    """Quat tuple -> 3x3 nested-list rotation matrix of component arrays."""
    x, y, z, w = q
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return [[1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
            [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
            [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)]]


def q_integrate(q, w, dt, eps=1e-12):
    """Exponential-map quaternion integration (matches quat.quat_integrate)."""
    wx, wy, wz = w
    angle = jnp.sqrt(wx * wx + wy * wy + wz * wz)
    denom = jnp.maximum(angle, eps)
    half = 0.5 * angle * dt
    s = jnp.sin(half) / denom
    dq = (wx * s, wy * s, wz * s, jnp.cos(half))
    q2 = q_mul(dq, q)
    n = jnp.maximum(jnp.sqrt(q2[0] ** 2 + q2[1] ** 2 + q2[2] ** 2 + q2[3] ** 2), eps)
    return (q2[0] / n, q2[1] / n, q2[2] / n, q2[3] / n)


# small nested-list matrix helpers (entries broadcastable arrays) ------------


def mat_vec(M, v):
    return tuple(sum(M[i][j] * v[j] for j in range(len(v))) for i in range(len(M)))


def mat_T(M):
    return [[M[j][i] for j in range(len(M))] for i in range(len(M[0]))]


def mat_mul(A, B):
    n, k, m = len(A), len(B), len(B[0])
    return [[sum(A[i][c] * B[c][j] for c in range(k)) for j in range(m)]
            for i in range(n)]


def mat_add(A, B):
    return [[A[i][j] + B[i][j] for j in range(len(A[0]))] for i in range(len(A))]


def mat_sub(A, B):
    return [[A[i][j] - B[i][j] for j in range(len(A[0]))] for i in range(len(A))]


def inv3(M):
    """Adjugate 3x3 inverse on component entries."""
    a, b, c = M[0]
    d, e, f = M[1]
    g, h, i = M[2]
    A11 = e * i - f * h
    A21 = f * g - d * i
    A31 = d * h - e * g
    det = a * A11 + b * A21 + c * A31
    r = 1.0 / det
    return [[A11 * r, (c * h - b * i) * r, (b * f - c * e) * r],
            [A21 * r, (a * i - c * g) * r, (c * d - a * f) * r],
            [A31 * r, (b * g - a * h) * r, (a * e - b * d) * r]]


def inv6(M):
    """6x6 SPD inverse via 3x3 block Schur (mirrors dynamics._inv6)."""
    P = [row[:3] for row in M[:3]]
    Q = [row[3:] for row in M[:3]]
    S = [row[3:] for row in M[3:]]
    Pinv = inv3(P)
    QtPinv = mat_mul(mat_T(Q), Pinv)
    Sc = mat_sub(S, mat_mul(QtPinv, Q))
    Scinv = inv3(Sc)
    PinvQ = mat_mul(Pinv, Q)
    TL = mat_add(Pinv, mat_mul(mat_mul(PinvQ, Scinv), QtPinv))
    TR = [[-x for x in row] for row in mat_mul(PinvQ, Scinv)]
    BL = mat_T(TR)
    return [TL[i] + TR[i] for i in range(3)] + [BL[i] + Scinv[i] for i in range(3)]


# ---------------------------------------------------------------------------
# host-side constants (numpy views of ModelConsts for trace-time folding)
# ---------------------------------------------------------------------------


class _Consts:
    def __init__(self, mc: ModelConsts):
        g = lambda x: np.asarray(x)
        self.parent = g(mc.parent)
        self.joint_pos = g(mc.joint_pos)       # (L, 3)
        self.joint_quat = g(mc.joint_quat)     # (L, 4) xyzw
        self.joint_axis = g(mc.joint_axis)     # (L, 3)
        self.link_mass = g(mc.link_mass)       # (L,)
        self.link_com = g(mc.link_com)         # (L, 3)
        self.link_inertia = g(mc.link_inertia)  # (L, 3, 3)
        self.dof_link = g(mc.dof_link)
        self.lower = g(mc.dof_limit_lower)
        self.upper = g(mc.dof_limit_upper)
        self.effort = g(mc.dof_effort_limit)
        self.vel_limit = g(mc.dof_velocity_limit)
        self.body_link = g(mc.body_link)
        self.body_offset = g(mc.body_offset)
        self.sph_link = g(mc.sph_link)
        self.sph_body = g(mc.sph_body)
        self.sph_offset = g(mc.sph_offset)
        self.sph_radius = g(mc.sph_radius)
        self.ancestors = g(mc.ancestors)       # (L, nu)
        self.nu = mc.nu
        self.L = mc.n_links
        self.nb = mc.n_bodies
        self.S = len(self.sph_link)
        # (nb, S) 0/1 sphere->body accumulation matrix
        m = np.zeros((self.nb, self.S), np.float32)
        m[self.sph_body, np.arange(self.S)] = 1.0
        self.body_mat = m
        # spheres on the base link (trunk + head) — the ones tested against
        # ceiling surfaces (tunnel roof / tire top ring)
        cs = np.nonzero(self.sph_link == 0)[0]
        assert (cs == np.arange(len(cs))).all(), "base spheres must lead"
        self.n_ceil = len(cs)
        # legs: dof chains hanging off the base (3 dofs each for Go2)
        legs = []
        for l in range(1, self.L):
            if self.parent[l] == 0:
                chain = [l - 1]
                child = l
                while True:
                    nxt = [k for k in range(1, self.L) if self.parent[k] == child]
                    if not nxt:
                        break
                    child = nxt[0]
                    chain.append(child - 1)
                legs.append(chain)
        self.legs = legs


_CONSTS_CACHE = {}


def consts_of(mc: ModelConsts) -> _Consts:
    key = id(mc)
    if key not in _CONSTS_CACHE:
        _CONSTS_CACHE[key] = _Consts(mc)
    return _CONSTS_CACHE[key]


# ---------------------------------------------------------------------------
# FK + velocities (component form, tree unrolled)
# ---------------------------------------------------------------------------


def fk_vel(c: _Consts, bp, bq, q, u):
    """bp: Vec3 of (N,); bq: Quat; q: (12, N); u: (18, N).

    Returns dict with per-link lists: pos, quat, com (Vec3), omega, vel
    (Vec3), world joint axes per dof, and world inertia matrices."""
    L = c.L
    pos = [None] * L
    quat = [None] * L
    omega = [None] * L
    vel = [None] * L
    pos[0], quat[0] = bp, bq
    vlin = (u[0], u[1], u[2])
    vang = (u[3], u[4], u[5])
    omega[0], vel[0] = vang, vlin
    axes = [None] * c.nu
    for l in range(1, L):
        p = int(c.parent[l])
        d = l - 1
        ax = tuple(float(a) for a in c.joint_axis[l])
        half = 0.5 * q[d]
        s, co = jnp.sin(half), jnp.cos(half)
        jq = (ax[0] * s, ax[1] * s, ax[2] * s, co)
        j0 = tuple(float(x) for x in c.joint_quat[l])
        quat[l] = q_mul(quat[p], q_mul(j0, jq))
        jp_c = tuple(float(x) for x in c.joint_pos[l])
        pos[l] = v_add(pos[p], q_rot(quat[p], jp_c))
        axes[d] = q_rot(quat[l], ax)
        omega[l] = v_add(omega[p], v_scale(axes[d], u[6 + d]))
        vel[l] = v_add(vel[p], v_cross(omega[p], v_sub(pos[l], pos[p])))
    return dict(pos=pos, quat=quat, omega=omega, vel=vel, axes=axes)


def fk_pose(c: _Consts, bp, bq, q):
    """Positions/orientations only (no velocities): lists of Vec3/Quat."""
    L = c.L
    pos = [None] * L
    quat = [None] * L
    pos[0], quat[0] = bp, bq
    for l in range(1, L):
        p = int(c.parent[l])
        d = l - 1
        ax = tuple(float(a) for a in c.joint_axis[l])
        half = 0.5 * q[d]
        s, co = jnp.sin(half), jnp.cos(half)
        jq = (ax[0] * s, ax[1] * s, ax[2] * s, co)
        j0 = tuple(float(x) for x in c.joint_quat[l])
        quat[l] = q_mul(quat[p], q_mul(j0, jq))
        pos[l] = v_add(pos[p], q_rot(quat[p], tuple(float(x) for x in c.joint_pos[l])))
    return pos, quat


def body_positions(mc: ModelConsts, s, body_idx):
    """World positions (N, K, 3) of selected reported bodies from a batched
    env-MAJOR EnvState — the env-minor replacement for
    vmap(engine.refresh_sim_state) where only positions are consumed
    (key-body/feet observations, legged_robot.py:1377-1396)."""
    c = consts_of(mc)
    pos, quat = fk_pose(c, tuple(s.base_pos.T), tuple(s.base_quat.T), s.dof_pos.T)
    cols = []
    for b in body_idx:
        l = int(c.body_link[b])
        off = tuple(float(x) for x in c.body_offset[b])
        p = v_add(pos[l], q_rot(quat[l], off))
        cols.append(jnp.stack(p, -1))            # (N, 3)
    return jnp.stack(cols, 1)                    # (N, K, 3)


def link_coms(c: _Consts, ls, com_shift=None):
    """World COM per link; com_shift (Vec3 of (N,)) offsets the base link
    (EnvParams.base_com_shift randomization)."""
    com = [None] * c.L
    for l in range(c.L):
        off = tuple(float(x) for x in c.link_com[l])
        if l == 0 and com_shift is not None:
            off = v_add(off, com_shift)
        com[l] = v_add(ls["pos"][l], q_rot(ls["quat"][l], off))
    return com


# ---------------------------------------------------------------------------
# composite-rigid-body mass matrix + structured factorization
# ---------------------------------------------------------------------------


def _world_inertia(c, ls, l):
    """R I_body R^T as nested 3x3 of (N,) arrays."""
    R = q_rotmat(ls["quat"][l])
    Ib = [[float(c.link_inertia[l][a][b]) for b in range(3)] for a in range(3)]
    return mat_mul(mat_mul(R, Ib), mat_T(R))


def _spatial_params(c, ls, com, l, added_mass=None):
    """(m, h, I) of link l about the base origin x0: h = m (com - x0),
    I = I_world + m ((r.r) E - r r^T)."""
    m = float(c.link_mass[l])
    if l == 0 and added_mass is not None:
        m = m + added_mass
    x0 = ls["pos"][0]
    r = v_sub(com[l], x0)
    h = v_scale(r, m)
    Iw = _world_inertia(c, ls, l)
    rr = v_dot(r, r)
    I = [[Iw[a][b] + (m * rr if a == b else 0.0) - m * r[a] * r[b]
          for b in range(3)] for a in range(3)]
    return m, h, I


def mass_factors(c: _Consts, ls, com, added_mass=None):
    """Composite-CRBA mass matrix about the base origin, factored into the
    same structure as dynamics.factor_mass_matrix: per-leg 3x3 inverses +
    6x6 base Schur complement.  Returns the factor dict used by solve()."""
    x0 = ls["pos"][0]
    # per-link spatial params
    sp = [_spatial_params(c, ls, com, l, added_mass) for l in range(c.L)]

    # composite params per dof (subtree of link d+1), accumulated leaf-up
    m_c = [None] * c.nu
    h_c = [None] * c.nu
    I_c = [None] * c.nu
    for leg in c.legs:
        for i in range(len(leg) - 1, -1, -1):
            d = leg[i]
            m, h, I = sp[d + 1]
            if i + 1 < len(leg):
                dn = leg[i + 1]
                m = m + m_c[dn]
                h = v_add(h, h_c[dn])
                I = mat_add(I, I_c[dn])
            m_c[d], h_c[d], I_c[d] = m, h, I

    # totals (base + all legs)
    m_t, h_t, I_t = sp[0]
    for leg in c.legs:
        d = leg[0]
        m_t = m_t + m_c[d]
        h_t = v_add(h_t, h_c[d])
        I_t = mat_add(I_t, I_c[d])

    # per-dof joint geometry: rho_d = (p_d - x0) x a_d
    rho = [None] * c.nu
    f_d = [None] * c.nu
    n_d = [None] * c.nu
    for leg in c.legs:
        for d in leg:
            a = ls["axes"][d]
            pd = v_sub(ls["pos"][d + 1], x0)
            rho[d] = v_cross(pd, a)
            # f_d = m^c rho - h^c x a ;  n_d = I^c a + h^c x rho
            f_d[d] = v_sub(v_scale(rho[d], m_c[d]), v_cross(h_c[d], a))
            n_d[d] = v_add(mat_vec(I_c[d], a), v_cross(h_c[d], rho[d]))

    # base 6x6 block:  [[m E, -h~],[h~, I]]  (u = [v_base, w_base, qd])
    z = jnp.zeros_like(h_t[0])
    hx, hy, hz = h_t
    mE = [[m_t + z if i == j else z for j in range(3)] for i in range(3)]
    neg_htilde = [[z, hz, -hy], [-hz, z, hx], [hy, -hx, z]]
    A = [mE[i] + neg_htilde[i] for i in range(3)] + \
        [[neg_htilde[j][i] for j in range(3)] + I_t[i] for i in range(3)]

    # leg blocks
    Dinv = []
    B = []
    BDinv = []
    for leg in c.legs:
        k = len(leg)
        Dk = [[None] * k for _ in range(k)]
        Bk = [[None] * k for _ in range(6)]
        for i, d in enumerate(leg):
            for j, dd in enumerate(leg[i:], start=i):
                # dd is deeper-or-equal: M = a_d . n_dd + rho_d . f_dd
                a = ls["axes"][d]
                val = v_dot(a, n_d[dd]) + v_dot(rho[d], f_d[dd])
                Dk[i][j] = val
                Dk[j][i] = val
            for r in range(3):
                Bk[r][i] = f_d[d][r]
                Bk[3 + r][i] = n_d[d][r]
        Dki = inv3(Dk)
        Dinv.append(Dki)
        B.append(Bk)
        BDinv.append(mat_mul(Bk, Dki))

    # Schur complement S = A - sum_k BDinv_k B_k^T
    S = A
    for k in range(len(c.legs)):
        S = mat_sub(S, mat_mul(BDinv[k], mat_T(B[k])))
    return dict(Dinv=Dinv, B=B, BDinv=BDinv, Sinv=inv6(S), legs=c.legs)


def solve(f, rhs):
    """x = M^-1 rhs; rhs is a list of 18 arrays (any broadcast shape with
    env-minor layout).  Mirrors dynamics.solve_mass on the factored form."""
    rb = rhs[:6]
    legs = f["legs"]
    rl = [[rhs[6 + d] for d in leg] for leg in legs]
    y = [mat_vec(f["Dinv"][k], rl[k]) for k in range(len(legs))]
    acc = list(rb)
    for k in range(len(legs)):
        t = mat_vec(f["BDinv"][k], rl[k])
        acc = [acc[i] - t[i] for i in range(6)]
    xb = mat_vec(f["Sinv"], acc)
    out = [None] * (6 + sum(len(l) for l in legs))
    for i in range(6):
        out[i] = xb[i]
    for k, leg in enumerate(legs):
        bt_xb = mat_vec(mat_T(f["B"][k]), xb)
        xl = [y[k][i] - mat_vec(f["Dinv"][k], bt_xb)[i] for i in range(len(leg))]
        for i, d in enumerate(leg):
            out[6 + d] = xl[i]
    return out


def limit_impulses(c: _Consts, f, u_arr, q, dt, *, iters=6, relax=0.8,
                   max_correction_vel=1.0):
    """Momentum-consistent dof limit enforcement, env-minor layout.

    Port of dynamics.limit_impulses (see its docstring for the physics: the
    old post-integration hard clamp deleted limb momentum with no reaction
    — an unphysical momentum source the r4 trot policy pumped into 95 m/s
    ballistic flight).  Resolves position/velocity-limit violations with
    joint-space impulses mapped through M^-1 assembled from the factored
    mass matrix: A_jj = blockdiag(D^-1) + W^T S^-1 W, W = B D^-1.

    u_arr: (18, N); q: (12, N).  Returns the corrected (18, N).
    """
    dtype = u_arr.dtype
    qd = u_arr[6:]                                     # (12, N)
    lo_l = jnp.asarray(c.lower, dtype)[:, None]
    hi_l = jnp.asarray(c.upper, dtype)[:, None]
    vl = jnp.asarray(c.vel_limit, dtype)[:, None]
    lo = jnp.maximum(-vl, jnp.minimum((lo_l - q) / dt, max_correction_vel))
    hi = jnp.minimum(vl, jnp.maximum((hi_l - q) / dt, -max_correction_vel))
    need = jnp.clip(qd, lo, hi) - qd                   # (12, N)
    active = (jnp.abs(need) > 0.0).astype(dtype)

    legs = f["legs"]
    # the stacked algebra below assumes the Go2 dof layout: leg k owns the
    # contiguous dof triple 3k..3k+2 (consts_of leg discovery in link order)
    assert all(list(leg) == [3 * k, 3 * k + 1, 3 * k + 2]
               for k, leg in enumerate(legs)), legs
    # stack the factors once per substep: the per-dof list algebra dispatches
    # thousands of (N,)-sized VPU ops; stacked (small, small, N) tensors with
    # N in the lane axis do the same work in ~30 ops (env-minor layout rule,
    # PERF_NOTES.md)
    W = jnp.zeros((6, c.nu) + need.shape[1:], dtype)
    for k, leg in enumerate(legs):
        blk = jnp.stack([jnp.stack(row) for row in f["BDinv"][k]])  # (6,3,N)
        W = W.at[:, np.asarray(leg)].set(blk)
    Sinv = jnp.stack([jnp.stack(row) for row in f["Sinv"]])         # (6,6,N)
    Dinv = jnp.stack([jnp.stack([jnp.stack(row) for row in f["Dinv"][k]])
                      for k in range(len(legs))])                   # (4,3,3,N)

    SinvW = jnp.einsum("abn,bdn->adn", Sinv, W)                     # (6,12,N)

    def Dinv_mul(j):
        jl = j.reshape((len(legs), 3) + j.shape[1:])                # (4,3,N)
        return jnp.einsum("kabn,kbn->kan", Dinv, jl).reshape(j.shape)

    def A_mul(j):
        Sw = jnp.einsum("adn,dn->an", SinvW, j)                     # (6,N)
        return Dinv_mul(j) + jnp.einsum("abn,an->bn", W, Sw)

    diag = (jnp.einsum("kaan->kan", Dinv).reshape(need.shape)
            + jnp.einsum("adn,adn->dn", W, SinvW))

    j = jnp.zeros_like(need)
    for _ in range(iters):
        j = (j + relax * (need - A_mul(j)) / diag) * active

    Sw = jnp.einsum("adn,dn->an", SinvW, j)            # = -du_base
    du_joint = Dinv_mul(j) + jnp.einsum("abn,an->bn", W, Sw)
    return u_arr + jnp.concatenate([-Sw, du_joint], axis=0)


# ---------------------------------------------------------------------------
# bias forces (u' = 0 propagation + subtree force accumulation)
# ---------------------------------------------------------------------------


def bias_forces(c: _Consts, ls, com, qd, gravity, added_mass=None):
    """C (list of 18 (N,) arrays) — same recursion as dynamics.bias_forces,
    projected via subtree force sums about the base origin."""
    L = c.L
    x0 = ls["pos"][0]
    alpha = [None] * L
    a_frame = [None] * L
    z = jnp.zeros_like(x0[0])
    alpha[0] = (z, z, z)
    a_frame[0] = (z - gravity[0], z - gravity[1], z - gravity[2])
    for l in range(1, L):
        p = int(c.parent[l])
        d = l - 1
        r = v_sub(ls["pos"][l], ls["pos"][p])
        wp = ls["omega"][p]
        a_frame[l] = v_add(a_frame[p],
                           v_add(v_cross(alpha[p], r), v_cross(wp, v_cross(wp, r))))
        alpha[l] = v_add(alpha[p], v_scale(v_cross(wp, ls["axes"][d]), qd[d]))

    # per-link forces about base origin
    tau_l = [None] * L
    f_l = [None] * L
    for l in range(L):
        m = float(c.link_mass[l])
        if l == 0 and added_mass is not None:
            m = m + added_mass
        coff = v_sub(com[l], ls["pos"][l])
        w = ls["omega"][l]
        a_com = v_add(a_frame[l],
                      v_add(v_cross(alpha[l], coff), v_cross(w, v_cross(w, coff))))
        f = v_scale(a_com, m)
        Iw = _world_inertia(c, ls, l)
        n = v_add(mat_vec(Iw, alpha[l]), v_cross(w, mat_vec(Iw, w)))
        f_l[l] = f
        tau_l[l] = v_add(n, v_cross(v_sub(com[l], x0), f))

    # subtree sums
    C = [None] * (6 + c.nu)
    f_tot = f_l[0]
    tau_tot = tau_l[0]
    for leg in c.legs:
        f_c, tau_c = None, None
        for i in range(len(leg) - 1, -1, -1):
            d = leg[i]
            l = d + 1
            f_c = f_l[l] if f_c is None else v_add(f_c, f_l[l])
            tau_c = tau_l[l] if tau_c is None else v_add(tau_c, tau_l[l])
            a = ls["axes"][d]
            rho = v_cross(v_sub(ls["pos"][l], x0), a)
            C[6 + d] = v_dot(a, tau_c) + v_dot(rho, f_c)
        f_tot = v_add(f_tot, f_c)
        tau_tot = v_add(tau_tot, tau_c)
    C[0], C[1], C[2] = f_tot
    C[3], C[4], C[5] = tau_tot
    return C


# ---------------------------------------------------------------------------
# contact: detection + matrix-free projected Jacobi in world frame
# ---------------------------------------------------------------------------


def sphere_geometry(c: _Consts, ls):
    """Centers (3, S, N) tuple-of-(S,N), plus lever table (12, 3, S, N):
    lever[d, :, s] = ancestors(d, link_s) * a_d x (c_s - p_d)."""
    centers = []
    for s in range(c.S):
        l = int(c.sph_link[s])
        off = tuple(float(x) for x in c.sph_offset[s])
        centers.append(q_rot(ls["quat"][l], off))
    cx = jnp.stack([v_add(ls["pos"][int(c.sph_link[s])], centers[s])[0]
                    for s in range(c.S)])
    cy = jnp.stack([v_add(ls["pos"][int(c.sph_link[s])], centers[s])[1]
                    for s in range(c.S)])
    cz = jnp.stack([v_add(ls["pos"][int(c.sph_link[s])], centers[s])[2]
                    for s in range(c.S)])
    cen = (cx, cy, cz)

    mask = c.ancestors[c.sph_link]          # (S, nu) numpy 0/1
    rows = []
    for d in range(c.nu):
        a = ls["axes"][d]                    # Vec3 (N,)
        pd = ls["pos"][int(c.dof_link[d])]   # joint origin = link origin
        dx = cen[0] - pd[0][None]            # (S, N)
        dy = cen[1] - pd[1][None]
        dz = cen[2] - pd[2][None]
        lx = a[1][None] * dz - a[2][None] * dy
        ly = a[2][None] * dx - a[0][None] * dz
        lz = a[0][None] * dy - a[1][None] * dx
        m = jnp.asarray(mask[:, d], lx.dtype)[:, None]
        rows.append(jnp.stack([lx * m, ly * m, lz * m]))
    lever = jnp.stack(rows)                  # (12, 3, S, N)
    return cen, lever


def apply_JT(lam, r, lever):
    """tau (18-list of (N,)) = J^T lam;  lam (3, S, N), r tuple (S, N)."""
    tau_lin = jnp.sum(lam, axis=1)           # (3, N)
    rx, ry, rz = r
    tx = jnp.sum(ry * lam[2] - rz * lam[1], axis=0)
    ty = jnp.sum(rz * lam[0] - rx * lam[2], axis=0)
    tz = jnp.sum(rx * lam[1] - ry * lam[0], axis=0)
    tau_j = jnp.sum(lever * lam[None], axis=(1, 2))   # (12, N)
    return ([tau_lin[0], tau_lin[1], tau_lin[2], tx, ty, tz]
            + [tau_j[d] for d in range(lever.shape[0])])


def apply_J(w, r, lever):
    """v (3, S, N) = J w for w an 18-list of (N,)."""
    wl = jnp.stack(w[0:3])[:, None, :]       # (3, 1, N)
    wa = (w[3], w[4], w[5])
    rx, ry, rz = r
    wxr = jnp.stack([wa[1][None] * rz - wa[2][None] * ry,
                     wa[2][None] * rx - wa[0][None] * rz,
                     wa[0][None] * ry - wa[1][None] * rx])
    wj = jnp.stack(w[6:])[:, None, None, :]  # (12, 1, 1, N)
    vj = jnp.sum(lever * wj, axis=0)         # (3, S, N)
    return wl + wxr + vj


def delassus_diag_inv(f, r, lever, dtype):
    """Per-contact 3x3 inverse blocks of G = J M^-1 J^T (+1e-6 reg), as a
    nested [3][3] list of (S, N) arrays — matches fastpath's Dinv."""
    S, N = r[0].shape
    z = jnp.zeros((S, N), dtype)
    o = jnp.ones((S, N), dtype)
    rx, ry, rz = r
    # J rows: [0:3] identity; [3+i] = e_i x r; [6+d] = lever[d]
    J = []
    J.append((o, z, z))
    J.append((z, o, z))
    J.append((z, z, o))
    J.append((z, -rz, ry))
    J.append((rz, z, -rx))
    J.append((-ry, rx, z))
    for d in range(lever.shape[0]):
        J.append((lever[d, 0], lever[d, 1], lever[d, 2]))
    # X = M^-1 J^T: solve with 18 rhs rows, each a (3, S, N) stack
    rhs = [jnp.stack(J[v]) for v in range(18)]
    X = solve(f, rhs)
    D = [[None] * 3 for _ in range(3)]
    for a in range(3):
        for b in range(3):
            acc = None
            for v in range(18):
                t = J[v][a] * X[v][b]
                acc = t if acc is None else acc + t
            D[a][b] = acc + (1e-6 if a == b else 0.0)
    return inv3(D)


def jacobi_solve(phi, n, r, lever, f, u_free, mu, dt, *, iters, relax,
                 baumgarte, slop, max_depen_vel, restitution, lam_max=25.0,
                 lam0=None):
    """Matrix-free world-frame projected block-Jacobi: same fixed point as
    fastpath.jacobi_solve_world.  With `lam0` (impulses from the previous
    substep, (3, S, N)) the iteration is warm-started — the projection's
    active mask immediately zeroes rows whose contact separated, so stale
    impulses cannot push through broken contacts.  Returns
    (u_new 18-list, force (3, S, N), lam (3, S, N))."""
    dtype = phi.dtype
    active = (phi < 0.0).astype(dtype)
    nx, ny, nz = n

    Dinv = delassus_diag_inv(f, r, lever, dtype)

    depth = jnp.maximum(-phi - slop, 0.0)
    bias_n = jnp.minimum(baumgarte / dt * depth, max_depen_vel)
    v_free = apply_J(u_free, r, lever)            # (3, S, N)
    vn0 = v_free[0] * nx + v_free[1] * ny + v_free[2] * nz
    bias_n = bias_n + restitution * jnp.maximum(-vn0, 0.0)
    bias = jnp.stack([bias_n * nx, bias_n * ny, bias_n * nz])

    mu_b = mu[None] if jnp.ndim(mu) == 1 else mu   # (S?, N) broadcast

    def project(lam):
        ln = lam[0] * nx + lam[1] * ny + lam[2] * nz
        lt = lam - jnp.stack([ln * nx, ln * ny, ln * nz])
        ln = jnp.clip(ln, 0.0, lam_max) * active
        tn = jnp.sqrt(lt[0] ** 2 + lt[1] ** 2 + lt[2] ** 2)
        scale = jnp.minimum(1.0, mu_b * ln / jnp.maximum(tn, 1e-9)) * active
        return lt * scale[None] + jnp.stack([ln * nx, ln * ny, ln * nz])

    def body(lam, _):
        tau = apply_JT(lam, r, lever)
        w = solve(f, tau)
        v = apply_J(w, r, lever) + v_free - bias
        dl = -(jnp.stack([
            Dinv[0][0] * v[0] + Dinv[0][1] * v[1] + Dinv[0][2] * v[2],
            Dinv[1][0] * v[0] + Dinv[1][1] * v[1] + Dinv[1][2] * v[2],
            Dinv[2][0] * v[0] + Dinv[2][1] * v[1] + Dinv[2][2] * v[2]]))
        return project(lam + relax * dl), None

    S, N = phi.shape
    init = (project(lam0.astype(dtype)) if lam0 is not None
            else jnp.zeros((3, S, N), dtype))
    lam, _ = jax.lax.scan(body, init, None, length=iters)
    tau = apply_JT(lam, r, lever)
    w = solve(f, tau)
    u_new = [u_free[i] + w[i] for i in range(18)]
    return u_new, lam / dt, lam


# ---------------------------------------------------------------------------
# batched patch sampling (env-minor): heights + normals for all spheres
# ---------------------------------------------------------------------------


def patch_sample_hn(patch_vals_T, patch_x0, patch_y0, origin, hscale, x, y):
    """Bilinear height + analytic normal at (x, y) (S, N) from per-env
    patches; patch_vals_T is (P, P, N) (layers already folded by extract).
    Mirrors patch.sample_height_and_normal in env-minor layout."""
    P = patch_vals_T.shape[0]
    gx = (x - origin[0]) / hscale - patch_x0[None].astype(x.dtype)
    gy = (y - origin[1]) / hscale - patch_y0[None].astype(x.dtype)
    gx = jnp.clip(gx, 0.0, P - 1.001)
    gy = jnp.clip(gy, 0.0, P - 1.001)
    idx = jnp.arange(P, dtype=x.dtype)[None, :, None]          # (1, P, 1)
    dx = gx[:, None, :] - idx                                   # (S, P, N)
    dy = gy[:, None, :] - idx
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(dx))
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy))
    dwx = jnp.where((dx > 0) & (dx < 1), -1.0, 0.0) + jnp.where(
        (dx <= 0) & (dx > -1), 1.0, 0.0)
    dwy = jnp.where((dy > 0) & (dy < 1), -1.0, 0.0) + jnp.where(
        (dy <= 0) & (dy > -1), 1.0, 0.0)
    rows = jnp.einsum("spn,pqn->sqn", wx, patch_vals_T)
    drows = jnp.einsum("spn,pqn->sqn", dwx, patch_vals_T)
    h = jnp.sum(rows * wy, axis=1)
    dhdx = jnp.sum(drows * wy, axis=1) / hscale
    dhdy = jnp.sum(rows * dwy, axis=1) / hscale
    inv = 1.0 / jnp.sqrt(dhdx * dhdx + dhdy * dhdy + 1.0)
    return h, (-dhdx * inv, -dhdy * inv, inv)


def patch_sample_ceiling(ceil_vals_T, patch_x0, patch_y0, origin, hscale, x, y):
    """Ceiling height + DOWNWARD surface normal at (x, y) — the outward
    normal of a solid that lies *above* z = c(x, y)."""
    h, n = patch_sample_hn(ceil_vals_T, patch_x0, patch_y0, origin, hscale, x, y)
    # floor normal of surface c is (-cx, -cy, 1)/L; the ceiling's outward
    # (into free space below) normal is (+cx, +cy, -1)/L = the negation
    return h, (-n[0], -n[1], -n[2])


def grid_sample_hn(grid: hf.HeightGrid, x, y):
    """Fallback height/normal queries straight off the grid (gathers; only
    used with cfg.patch_size == 0 and no movable layers).  x, y: (S, N)."""
    h = hf.sample_height(grid, x, y)
    n = hf.sample_normal(grid, x, y)
    return h, (n[..., 0], n[..., 1], n[..., 2])


# ---------------------------------------------------------------------------
# substep + control step (the drop-in batched API)
# ---------------------------------------------------------------------------


class SoAState(NamedTuple):
    bp: jnp.ndarray    # (3, N)
    bq: jnp.ndarray    # (4, N)
    q: jnp.ndarray     # (12, N)
    u: jnp.ndarray     # (18, N)


def _to_soa(s) -> SoAState:
    return SoAState(bp=s.base_pos.T, bq=s.base_quat.T, q=s.dof_pos.T, u=s.u.T)


def _from_soa(sd: SoAState):
    from agility_tpu.physics.engine import EnvState

    return EnvState(base_pos=sd.bp.T, base_quat=sd.bq.T,
                    dof_pos=sd.q.T, u=sd.u.T)


def substep(mc: ModelConsts, cfg, sd: SoAState, target, kp, kd, prm, sampler,
            ceil_sampler=None, lam0=None):
    """One physics substep in env-minor layout.

    target/kp/kd: (12, N); prm: dict of env-minor randomization arrays
    (kp_scale/kd_scale (12, N), friction (N,), added_mass (N,),
    com_shift Vec3 of (N,)); sampler(x, y) -> (h (S,N), n Vec3 of (S,N)).
    With `ceil_sampler`, the base-link spheres (trunk + head) are also
    tested against the overhead surface (tunnel roof / tire top ring) and
    contribute extra contact rows with downward normals.
    Returns (new SoAState, (tau, tau_org) (12, N), force (3, S', N))."""
    c = consts_of(mc)
    bp = (sd.bp[0], sd.bp[1], sd.bp[2])
    bq = (sd.bq[0], sd.bq[1], sd.bq[2], sd.bq[3])

    ls = fk_vel(c, bp, bq, sd.q, sd.u)
    com = link_coms(c, ls, prm.get("com_shift"))

    # PD torques (engine.pd_torques)
    eff = jnp.asarray(c.effort, sd.q.dtype)[:, None]
    tau_org = prm["kp_scale"] * kp * (target - sd.q) - prm["kd_scale"] * kd * sd.u[6:]
    tau_j = jnp.clip(tau_org, -eff, eff)

    f = mass_factors(c, ls, com, prm.get("added_mass"))
    C = bias_forces(c, ls, com, [sd.u[6 + d] for d in range(c.nu)],
                    cfg.gravity, prm.get("added_mass"))

    rhs = [-C[i] for i in range(6)] + [tau_j[d] - C[6 + d] for d in range(c.nu)]
    du = solve(f, rhs)
    u_free = [sd.u[i] + cfg.dt * du[i] for i in range(18)]

    # contact
    cen, lever = sphere_geometry(c, ls)
    h, n = sampler(cen[0], cen[1])
    radius = jnp.asarray(c.sph_radius, h.dtype)[:, None]
    phi = (cen[2] - h) * n[2] - radius
    r = (cen[0] - bp[0][None], cen[1] - bp[1][None], cen[2] - bp[2][None])

    if ceil_sampler is not None:
        k = c.n_ceil
        ch, cn = ceil_sampler(cen[0][:k], cen[1][:k])
        # gap below an overhead surface: positive while clear of the roof
        phi_c = (ch - cen[2][:k]) * (-cn[2]) - radius[:k]
        phi = jnp.concatenate([phi, phi_c], axis=0)
        n = tuple(jnp.concatenate([n[i], cn[i]], axis=0) for i in range(3))
        r = tuple(jnp.concatenate([r[i], r[i][:k]], axis=0) for i in range(3))
        lever = jnp.concatenate([lever, lever[:, :, :k]], axis=2)

    u_new, force, lam = jacobi_solve(
        phi, n, r, lever, f, u_free, prm["friction"], cfg.dt,
        iters=cfg.jacobi_iters, relax=cfg.jacobi_relax,
        baumgarte=cfg.baumgarte, slop=cfg.contact_slop,
        max_depen_vel=cfg.max_depenetration_vel, restitution=cfg.restitution,
        lam0=lam0)

    # integration (engine semantics: base-velocity backstop, semi-implicit
    # Euler, joint limit clamp)
    u_arr = jnp.stack(u_new)                          # (18, N)
    u_arr = u_arr.at[0:3].set(jnp.clip(u_arr[0:3], -100.0, 100.0))
    u_arr = u_arr.at[3:6].set(jnp.clip(u_arr[3:6], -50.0, 50.0))
    if cfg.enforce_joint_limits:
        # physical limit enforcement (see limit_impulses) — replaces the
        # momentum-deleting hard clamp; the clamp below only catches the
        # frozen-active-set coupling residue
        u_arr = limit_impulses(c, f, u_arr, sd.q, cfg.dt)
    bp2 = sd.bp + cfg.dt * u_arr[0:3]
    bq2 = jnp.stack(q_integrate(bq, (u_arr[3], u_arr[4], u_arr[5]), cfg.dt))
    q2 = sd.q + cfg.dt * u_arr[6:]
    qd2 = u_arr[6:]
    if cfg.enforce_joint_limits:
        lo = jnp.asarray(c.lower, q2.dtype)[:, None]
        hi = jnp.asarray(c.upper, q2.dtype)[:, None]
        vl = jnp.asarray(c.vel_limit, q2.dtype)[:, None]
        q2c = jnp.clip(q2, lo, hi)
        qd2 = jnp.where(q2c == q2, qd2, 0.0)
        q2 = q2c
        qd2 = jnp.clip(qd2, -vl, vl)
    u_arr = jnp.concatenate([u_arr[:6], qd2], axis=0)
    return SoAState(bp=bp2, bq=bq2, q=q2, u=u_arr), (tau_j, tau_org), force, lam


def control_step_batched(mc: ModelConsts, cfg, grid: hf.HeightGrid, s,
                         control, params):
    """Drop-in replacement for vmap(engine.control_step): same arguments
    (env-MAJOR batched EnvState/Control/EnvParams) and same returns —
    (state, (tau, tau_org), body_forces (N, B, 3), max_body_forces,
    terrain_patch) — computed in env-minor layout."""
    from agility_tpu.physics import patch as pt
    from agility_tpu.physics import windows as win

    c = consts_of(mc)
    N = s.base_pos.shape[0]
    sd = _to_soa(s)
    target = control.target.T
    kp = control.kp.T
    kd = control.kd.T
    prm = dict(
        kp_scale=params.kp_scale.T,
        kd_scale=params.kd_scale.T,
        friction=params.friction,
        added_mass=params.added_base_mass,
        com_shift=(params.base_com_shift[:, 0], params.base_com_shift[:, 1],
                   params.base_com_shift[:, 2]),
    )

    terrain_patch = None
    ceil_sampler = None
    if cfg.patch_size and win.enabled(grid, size=cfg.patch_size):
        # Pallas band-DMA extraction (physics/windows.py): one async
        # HBM->VMEM copy per env instead of XLA's scalar row gather —
        # measured 2.7x on course-world shapes (tools/bench_windows.py)
        bp = win.extract_band_batch(
            grid, s.base_pos[:, :2], cfg.patch_size, params.hf_weights)
        terrain_patch = bp
        vals_T = jnp.transpose(bp.values, (1, 2, 0))          # (P8, 64, N)
        sampler = lambda x, y: win.band_sample_hn(
            vals_T, bp.x0, bp.y0, bp.roff, bp.coff, grid.origin,
            grid.hscale, cfg.patch_size, x, y)
        if bp.ceil is not None:
            ceil_T = jnp.transpose(bp.ceil, (1, 2, 0))
            ceil_sampler = lambda x, y: win.band_sample_ceiling(
                ceil_T, bp.x0, bp.y0, bp.roff, bp.coff, grid.origin,
                grid.hscale, cfg.patch_size, x, y)
    elif cfg.patch_size:
        terrain_patch = pt.extract_batch(
            grid, s.base_pos[:, :2], cfg.patch_size, params.hf_weights)
        vals_T = jnp.transpose(terrain_patch.values, (1, 2, 0))   # (P, P, N)
        sampler = lambda x, y: patch_sample_hn(
            vals_T, terrain_patch.x0, terrain_patch.y0, grid.origin,
            grid.hscale, x, y)
        if terrain_patch.ceil is not None:
            ceil_T = jnp.transpose(terrain_patch.ceil, (1, 2, 0))
            ceil_sampler = lambda x, y: patch_sample_ceiling(
                ceil_T, terrain_patch.x0, terrain_patch.y0, grid.origin,
                grid.hscale, x, y)
    else:
        if params.hf_weights is not None or grid.ceiling is not None:
            raise NotImplementedError(
                "movable layers / ceilings require patch_size > 0")
        sampler = lambda x, y: grid_sample_hn(grid, x, y)

    body_mat = jnp.asarray(c.body_mat)                 # (B, S)
    if ceil_sampler is not None:
        # ceiling contact rows accumulate onto the same base-link bodies
        body_mat = jnp.concatenate([body_mat, body_mat[:, : c.n_ceil]], axis=1)

    warm = cfg.warm_start

    def body(carry, _):
        if warm:
            st, _, lam0 = carry
        else:
            (st, _), lam0 = carry, None
        st2, taus, force, lam = substep(mc, cfg, st, target, kp, kd, prm,
                                        sampler, ceil_sampler, lam0=lam0)
        bf = jnp.einsum("bs,asn->ban", body_mat, force)   # (B, 3, N)
        out = (st2, taus, lam) if warm else (st2, taus)
        return out, bf

    zt = jnp.zeros((c.nu, N), s.base_pos.dtype)
    if warm:
        lam_init = jnp.zeros((3, body_mat.shape[1], N), s.base_pos.dtype)
        (sd2, taus, _), bf_all = jax.lax.scan(
            body, (sd, (zt, zt), lam_init), None, length=cfg.decimation)
    else:
        (sd2, taus), bf_all = jax.lax.scan(
            body, (sd, (zt, zt)), None, length=cfg.decimation)
    body_forces = jnp.transpose(bf_all[-1], (2, 0, 1))            # (N, B, 3)
    max_body_forces = jnp.transpose(
        jnp.max(jnp.abs(bf_all), axis=0), (2, 0, 1))
    tau_out = (taus[0].T, taus[1].T)
    return _from_soa(sd2), tau_out, body_forces, max_body_forces, terrain_patch
