"""Pallas contact kernel vs the XLA fastpath solver (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from agility_tpu.core.urdf import build_go2_model
from agility_tpu.physics import dynamics as dyn
from agility_tpu.physics import fastpath as fp
from agility_tpu.physics import heightfield as hf
from agility_tpu.physics import kinematics as kin
from agility_tpu.physics.constants import ModelConsts

MODEL = build_go2_model()
MC = ModelConsts.from_model(MODEL)
GRID = hf.flat_grid()
GRAV = jnp.array([0.0, 0.0, -9.81])
DT = 0.005


def make_batch(rng, N=8):
    outs = []
    for i in range(N):
        bp = jnp.asarray([0.1 * rng.normal(), 0.1 * rng.normal(), 0.28 + 0.02 * rng.normal()])
        q = rng.normal(size=4) * 0.05 + np.array([0, 0, 0, 1.0])
        bq = jnp.asarray(q / np.linalg.norm(q))
        qj = MC.default_dof_pos + jnp.asarray(rng.uniform(-0.2, 0.2, 12))
        u = jnp.asarray(rng.normal(size=18) * 0.3)
        ls = kin.fk(MC, bp, bq, qj)
        ls = kin.velocities(MC, ls, u[:3], u[3:6], u[6:])
        axes = kin.world_axes(MC, ls)
        M, C = fp.mass_and_bias(MC, ls, axes, u[6:], GRAV)
        f = dyn.factor_mass_matrix(M)
        u_free = u + DT * dyn.solve_mass(f, -C)
        phi, n, JpT = fp.detect_T(MC, ls, axes, GRID)
        MinvJT = dyn.solve_mass(f, JpT)
        G = JpT.T @ MinvJT
        outs.append((phi, n, JpT, MinvJT, G, u_free, f))
    stack = lambda i: jnp.stack([o[i] for o in outs])
    return (stack(0), stack(1), stack(2), stack(3), stack(4), stack(5),
            [o[6] for o in outs])


def test_pallas_kernel_matches_xla(rng, monkeypatch):
    # interpret mode: the kernel runs on CPU without Mosaic
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))
    from agility_tpu.physics import pallas_contact as pc

    phi, n, JpT, MinvJT, G, u_free, factors = make_batch(rng, N=8)
    u_new, force = pc.jacobi_solve_batch(
        phi, n, JpT, MinvJT, G, u_free, jnp.ones(8), DT, iters=20)

    for i in range(8):
        u_ref, f_ref = fp.jacobi_solve_world(
            phi[i], n[i], JpT[i], factors[i], u_free[i], 1.0, DT, iters=20)
        np.testing.assert_allclose(np.asarray(u_new[i]), np.asarray(u_ref),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(force[i]), np.asarray(f_ref),
                                   rtol=1e-2, atol=5e-1)
