"""Pallas TPU kernel for the per-env contact LCP (the "contact-QP block" of
BASELINE.json's north star).

Solves, for a block of envs resident in VMEM, the projected block-Jacobi
iteration of `fastpath.jacobi_solve_world`: ten fused sweeps of

    v    = G lam + v_free - bias
    dlam = -Dinv_block v
    lam  = project_cone(lam + relax * dlam)

with zero HBM round-trips between iterations.  Data is laid out *planar*
(all x-components of the S contacts, then y, then z) so every in-kernel
tensor is 2-D with contiguous slices — no strided access, no tiny minor
dims.  The XLA path materializes ~10 intermediate (N, 72) tensors per
iteration; here the whole solve is one kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(S, iters, relax, G_ref, vf_ref, bias_ref, n_ref, act_ref,
            dinv_ref, mu_ref, lam_ref):
    """One program = one block of E envs.

    Shapes (E = env block):
      G    (E, 3S, 3S)   planar Delassus
      vf   (E, 3S)       J u_free (planar)
      bias (E, 3S)       world-frame bias (planar)
      n    (E, 3S)       planar normals [nx | ny | nz]
      act  (E, S)        active mask
      dinv (E, 9S)       planar 3x3 block inverses [D00..D22, each (S,)]
      mu   (E, S)        friction coefficient (broadcast per contact)
      lam  (E, 3S)       output impulses (planar)
    """
    G = G_ref[:]
    vf = vf_ref[:] - bias_ref[:]
    n = n_ref[:]
    act = act_ref[:]
    mu = mu_ref[:]
    nx, ny, nz = n[:, :S], n[:, S : 2 * S], n[:, 2 * S :]
    d = dinv_ref[:]
    D = [d[:, i * S : (i + 1) * S] for i in range(9)]

    lam = jnp.zeros_like(vf)
    for _ in range(iters):
        # v = G lam + v_free - bias   (batched matvec as mul+reduce, VPU)
        v = jnp.sum(G * lam[:, None, :], axis=-1) + vf
        vx, vy, vz = v[:, :S], v[:, S : 2 * S], v[:, 2 * S :]
        dx = -(D[0] * vx + D[1] * vy + D[2] * vz)
        dy = -(D[3] * vx + D[4] * vy + D[5] * vz)
        dz = -(D[6] * vx + D[7] * vy + D[8] * vz)
        lx = lam[:, :S] + relax * dx
        ly = lam[:, S : 2 * S] + relax * dy
        lz = lam[:, 2 * S :] + relax * dz
        # friction-cone projection against the contact normal
        ln = lx * nx + ly * ny + lz * nz
        tx, ty, tz = lx - ln * nx, ly - ln * ny, lz - ln * nz
        ln = jnp.clip(ln, 0.0, 25.0) * act   # impulse cap (see fastpath)
        tn = jnp.sqrt(tx * tx + ty * ty + tz * tz + 1e-18)
        scale = jnp.minimum(1.0, mu * ln / tn) * act
        lx = tx * scale + ln * nx
        ly = ty * scale + ln * ny
        lz = tz * scale + ln * nz
        lam = jnp.concatenate([lx, ly, lz], axis=1)
    lam_ref[:] = lam


@functools.partial(jax.jit, static_argnames=("S", "iters", "relax", "env_block"))
def solve(G, vf, bias, n, act, dinv, mu, *, S, iters=10, relax=0.6,
          env_block=8):
    """Batched planar contact solve.  All inputs have leading env axis N
    (N must be a multiple of env_block).  Returns lam (N, 3S)."""
    N = G.shape[0]
    grid = (N // env_block,)
    E = env_block
    bs = lambda *shape: pl.BlockSpec(
        (E,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, S, iters, relax),
        grid=grid,
        in_specs=[
            bs(3 * S, 3 * S), bs(3 * S), bs(3 * S), bs(3 * S), bs(S),
            bs(9 * S), bs(S),
        ],
        out_specs=bs(3 * S),
        out_shape=jax.ShapeDtypeStruct((N, 3 * S), G.dtype),
    )(G, vf, bias, n, act, dinv, mu)


# ---------------------------------------------------------------------------
# batched wrapper with the same contract as fastpath.jacobi_solve_world
# ---------------------------------------------------------------------------


def _to_planar(x_interleaved, S):
    """(..., 3S) interleaved [s*3+a] -> planar [a*S+s]."""
    shp = x_interleaved.shape[:-1]
    return jnp.swapaxes(
        x_interleaved.reshape(shp + (S, 3)), -1, -2).reshape(shp + (3 * S,))


def _from_planar(x_planar, S):
    shp = x_planar.shape[:-1]
    return jnp.swapaxes(
        x_planar.reshape(shp + (3, S)), -1, -2).reshape(shp + (3 * S,))


def jacobi_solve_batch(phi, normals, JpT, MinvJT, G, u_free, mu, dt,
                       iters=10, relax=0.6, baumgarte=0.2, slop=0.002,
                       max_depen_vel=1.0, restitution=0.0, env_block=8):
    """Batched (leading env axis) contact solve through the Pallas kernel.

    Inputs use the interleaved fastpath layout; returns (u_new, force_world
    (N, S, 3)) exactly like vmapped fastpath.jacobi_solve_world.
    """
    from agility_tpu.physics.dynamics import _inv3

    N, nv, S3 = JpT.shape
    S = S3 // 3
    dt_ = u_free.dtype
    active = (phi < 0.0).astype(dt_)

    depth = jnp.maximum(-phi - slop, 0.0)
    bias_n = jnp.minimum(baumgarte / dt * depth, max_depen_vel)
    v_free = jnp.einsum("nvs,nv->ns", JpT, u_free)             # (N, 3S) interleaved
    v3 = v_free.reshape(N, S, 3)
    vn0 = jnp.sum(v3 * normals, -1)
    bias_n = bias_n + restitution * jnp.maximum(-vn0, 0.0)
    bias = (bias_n[:, :, None] * normals).reshape(N, 3 * S)

    # planar reorder
    P = lambda x: _to_planar(x, S)
    Gp = _to_planar(jnp.swapaxes(_to_planar(G, S), -1, -2), S)
    # 3x3 diagonal blocks of planar G: D[a, b, s] = Gp[aS+s, bS+s]
    G4 = Gp.reshape(N, 3, S, 3, S)
    D = jnp.diagonal(G4, axis1=2, axis2=4)                     # (N, 3, 3, S)
    Db = jnp.moveaxis(D, -1, 1)                                # (N, S, 3, 3)
    Dinv = _inv3(Db + 1e-6 * jnp.eye(3, dtype=dt_))
    dinv_planar = jnp.moveaxis(Dinv, 1, -1).reshape(N, 9 * S)  # [D00..D22]

    n_planar = jnp.swapaxes(normals, -1, -2).reshape(N, 3 * S)
    mu_b = jnp.broadcast_to(jnp.reshape(mu, (N, 1)), (N, S))

    lam_planar = solve(Gp, P(v_free), P(bias), n_planar, active, dinv_planar,
                       mu_b, S=S, iters=iters, relax=float(relax),
                       env_block=env_block)
    lam = _from_planar(lam_planar, S)                          # (N, 3S) interleaved
    u_new = u_free + jnp.einsum("nvs,ns->nv", MinvJT, lam)
    force_w = lam.reshape(N, S, 3) / dt
    return u_new, force_w
