"""Layout-optimized path vs reference-path equivalence."""
import numpy as np
import jax
import jax.numpy as jnp

from agility_tpu.core.urdf import build_go2_model
from agility_tpu.physics import contact as ct
from agility_tpu.physics import dynamics as dyn
from agility_tpu.physics import engine as eng
from agility_tpu.physics import fastpath as fp
from agility_tpu.physics import heightfield as hf
from agility_tpu.physics import kinematics as kin
from agility_tpu.physics.constants import ModelConsts

MODEL = build_go2_model()
MC = ModelConsts.from_model(MODEL)
GRID = hf.flat_grid()
GRAV = jnp.array([0.0, 0.0, -9.81])


def rand_state(rng, z=0.28):
    bp = jnp.asarray([0.1 * rng.normal(), 0.1 * rng.normal(), z])
    q = rng.normal(size=4) * 0.1 + np.array([0, 0, 0, 1.0])
    bq = jnp.asarray(q / np.linalg.norm(q))
    qj = MC.default_dof_pos + jnp.asarray(rng.uniform(-0.3, 0.3, 12))
    u = jnp.asarray(rng.normal(size=18) * 0.3)
    ls = kin.fk(MC, bp, bq, qj)
    ls = kin.velocities(MC, ls, u[:3], u[3:6], u[6:])
    return ls, u


def test_mass_and_bias_match(rng):
    for _ in range(3):
        ls, u = rand_state(rng)
        axes = kin.world_axes(MC, ls)
        M_ref = dyn.mass_matrix(MC, ls, axes)
        C_ref = dyn.bias_forces(MC, ls, axes, u[6:], GRAV)
        M_fast, C_fast = fp.mass_and_bias(MC, ls, axes, u[6:], GRAV)
        np.testing.assert_allclose(np.asarray(M_fast), np.asarray(M_ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(C_fast), np.asarray(C_ref),
                                   rtol=1e-3, atol=1e-4)


def test_jacobian_T_matches_points_jacobian(rng):
    ls, u = rand_state(rng)
    axes = kin.world_axes(MC, ls)
    sl, _, _, _ = MODEL.sphere_arrays()
    import numpy as onp

    con = ct.detect(MC, ls, axes, GRID)
    Jp_ref = kin.points_jacobian(MC, ls, axes, onp.asarray(sl, onp.int32), con.centers)
    phi, n, JpT = fp.detect_T(MC, ls, axes, GRID)
    S = phi.shape[0]
    Jp_fast = JpT.reshape(18, S, 3).transpose(1, 2, 0)
    np.testing.assert_allclose(np.asarray(Jp_fast), np.asarray(Jp_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(phi), np.asarray(con.phi), atol=1e-5)


def test_world_jacobi_matches_frame_jacobi(rng):
    ls, u = rand_state(rng)
    axes = kin.world_axes(MC, ls)
    M = dyn.mass_matrix(MC, ls, axes)
    C = dyn.bias_forces(MC, ls, axes, u[6:], GRAV)
    f = dyn.factor_mass_matrix(M)
    u_free = u + 0.005 * dyn.solve_mass(f, -C)
    con = ct.detect(MC, ls, axes, GRID)
    u_ref, lam_ref, _ = ct.jacobi_solve(con, f, u_free, 1.0, 0.005, iters=40)
    phi, n, JpT = fp.detect_T(MC, ls, axes, GRID)
    u_fast, _ = fp.jacobi_solve_world(phi, n, JpT, f, u_free, 1.0, 0.005, iters=40)
    np.testing.assert_allclose(np.asarray(u_fast), np.asarray(u_ref),
                               rtol=1e-3, atol=2e-3)


def test_fast_substep_matches_reference_substep():
    cfg_fast = eng.EngineConfig(fast=True)
    cfg_ref = eng.EngineConfig(fast=False)
    s = eng.EnvState(
        base_pos=jnp.array([0.0, 0.0, 0.32]),
        base_quat=jnp.array([0.0, 0.0, 0.0, 1.0]),
        dof_pos=MC.default_dof_pos,
        u=jnp.zeros(18).at[0].set(0.4).at[2].set(-0.3),
    )
    control = eng.Control(MC.default_dof_pos, jnp.full(12, 40.0), jnp.full(12, 1.0))
    params = eng.EnvParams.nominal()
    for _ in range(20):
        s_f, _, _ = eng.substep(MC, cfg_fast, GRID, s, control, params)
        s_r, _, _ = eng.substep(MC, cfg_ref, GRID, s, control, params)
        np.testing.assert_allclose(np.asarray(s_f.base_pos), np.asarray(s_r.base_pos),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(s_f.u), np.asarray(s_r.u), atol=2e-2)
        s = s_f


def test_fast_stand_is_stable():
    cfg = eng.EngineConfig(fast=True)
    control = eng.Control(MC.default_dof_pos, jnp.full(12, 40.0), jnp.full(12, 1.0))
    params = eng.EnvParams.nominal()
    s = eng.EnvState(
        base_pos=jnp.array([0.0, 0.0, 0.42]),
        base_quat=jnp.array([0.0, 0.0, 0.0, 1.0]),
        dof_pos=MC.default_dof_pos,
        u=jnp.zeros(18),
    )
    step = jax.jit(lambda st: eng.control_step(MC, cfg, GRID, st, control, params)[0])
    for _ in range(100):
        s = step(s)
    assert np.isfinite(np.asarray(s.base_pos)).all()
    assert 0.22 < float(s.base_pos[2]) < 0.40
    assert float(jnp.linalg.norm(s.u[:6])) < 0.15
