"""Engine integration tests: drop/settle, standing stability, force balance."""
import numpy as np
import jax
import jax.numpy as jnp

from agility_tpu.core.urdf import build_go2_model
from agility_tpu.physics import engine as eng
from agility_tpu.physics import heightfield as hf
from agility_tpu.physics.constants import ModelConsts

MODEL = build_go2_model()
MC = ModelConsts.from_model(MODEL)
CFG = eng.EngineConfig()
GRID = hf.flat_grid()


def default_state(z=0.42):
    return eng.EnvState(
        base_pos=jnp.array([0.0, 0.0, z]),
        base_quat=jnp.array([0.0, 0.0, 0.0, 1.0]),
        dof_pos=MC.default_dof_pos,
        u=jnp.zeros(18),
    )


def default_control():
    return eng.Control(
        target=MC.default_dof_pos,
        kp=jnp.full(12, 40.0),   # go2_locomotion_config.py:56-57
        kd=jnp.full(12, 1.0),
    )


def simulate(n_steps, state=None, solver="pgs"):
    cfg = eng.EngineConfig(solver=solver)
    params = eng.EnvParams.nominal()
    control = default_control()

    @jax.jit
    def step(s):
        s2, tau, bf, mbf, _ = eng.control_step(MC, cfg, GRID, s, control, params)
        return s2, bf

    s = state if state is not None else default_state()
    bf = None
    for _ in range(n_steps):
        s, bf = step(s)
    return s, bf


def test_stand_is_stable_pgs():
    s, bf = simulate(100)  # 2 s
    assert np.isfinite(np.asarray(s.base_pos)).all()
    z = float(s.base_pos[2])
    assert 0.22 < z < 0.40, z
    # quasi-static: base nearly still
    assert float(jnp.linalg.norm(s.u[:6])) < 0.12, np.asarray(s.u)
    # vertical ground reaction approximately supports the weight
    fz = float(jnp.sum(bf[:, 2]))
    weight = MODEL.total_mass() * 9.81
    assert abs(fz - weight) < 0.35 * weight, (fz, weight)
    # feet (body names *_foot) carry the load
    feet = [i for i, n in enumerate(MODEL.body_names) if n.endswith("_foot")]
    fz_feet = float(jnp.sum(bf[feet, 2]))
    assert fz_feet > 0.7 * fz, (fz_feet, fz)


def test_drop_no_deep_penetration():
    s, _ = simulate(150, state=default_state(z=0.6))
    # feet must rest at sphere radius above ground (within slop)
    bp, bq, bv, bw = eng.refresh_sim_state(MC, s)
    feet = [i for i, n in enumerate(MODEL.body_names) if n.endswith("_foot")]
    foot_z = np.asarray(bp)[feet, 2]
    assert np.all(foot_z > 0.0), foot_z     # not through the floor
    assert np.all(foot_z < 0.06), foot_z    # actually on the ground


def test_free_fall_matches_ballistics():
    """With the robot far above ground, 0.1 s of sim = analytic ballistics."""
    s = default_state(z=5.0)
    cfg = eng.EngineConfig()
    control = default_control()
    params = eng.EnvParams.nominal()

    @jax.jit
    def step(st):
        s2, *_ = eng.control_step(MC, cfg, GRID, st, control, params)
        return s2

    for _ in range(5):  # 5 control steps = 0.1 s
        s = step(s)
    t = 0.1
    # semi-implicit Euler free fall: z = z0 - g*dt^2*n(n+1)/2 = z0 - g*t(t+dt)/2
    z_expect = 5.0 - 0.5 * 9.81 * t * (t + 0.005)
    np.testing.assert_allclose(float(s.base_pos[2]), z_expect, atol=2e-4)
    np.testing.assert_allclose(float(s.u[2]), -9.81 * t, atol=2e-2)


def test_batched_vmap_runs():
    N = 8
    cfg = eng.EngineConfig()
    control = default_control()
    params = eng.EnvParams.nominal()
    s = default_state()
    batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (N,) + x.shape), s)
    bparams = jax.tree.map(lambda x: jnp.broadcast_to(x, (N,) + x.shape), params)
    bcontrol = jax.tree.map(lambda x: jnp.broadcast_to(x, (N,) + x.shape), control)

    @jax.jit
    def step(sb):
        return jax.vmap(lambda si, ci, pi: eng.control_step(MC, cfg, GRID, si, ci, pi)[0])(
            sb, bcontrol, bparams
        )

    out = step(batch)
    assert out.base_pos.shape == (N, 3)
    assert np.isfinite(np.asarray(out.base_pos)).all()


def test_soft_solver_stands():
    s, bf = simulate(100, solver="soft")
    z = float(s.base_pos[2])
    assert np.isfinite(np.asarray(s.base_pos)).all()
    assert 0.18 < z < 0.40, z
