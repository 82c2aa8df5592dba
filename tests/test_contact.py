"""Contact solver validation: Jacobi vs Gauss-Seidel oracle, complementarity
(KKT) residuals, friction cone feasibility."""
import numpy as np
import jax
import jax.numpy as jnp

from agility_tpu.core.urdf import build_go2_model
from agility_tpu.physics import contact as ct
from agility_tpu.physics import dynamics as dyn
from agility_tpu.physics import engine as eng
from agility_tpu.physics import heightfield as hf
from agility_tpu.physics import kinematics as kin
from agility_tpu.physics.constants import ModelConsts

MODEL = build_go2_model()
MC = ModelConsts.from_model(MODEL)
GRID = hf.flat_grid()
DT = 0.005
MU = 1.0


def make_problem(z=0.28, vz=-0.4):
    """Robot slightly interpenetrating the ground, falling."""
    bp = jnp.array([0.0, 0.0, z])
    bq = jnp.array([0.0, 0.0, 0.0, 1.0])
    qj = MC.default_dof_pos
    u = jnp.zeros(18).at[2].set(vz).at[0].set(0.3)
    ls = kin.fk(MC, bp, bq, qj)
    ls = kin.velocities(MC, ls, u[:3], u[3:6], u[6:])
    axes = kin.world_axes(MC, ls)
    M = dyn.mass_matrix(MC, ls, axes)
    C = dyn.bias_forces(MC, ls, axes, u[6:], jnp.array([0.0, 0.0, -9.81]))
    factors = dyn.factor_mass_matrix(M)
    con = ct.detect(MC, ls, axes, GRID)
    u_free = u + DT * dyn.solve_mass(factors, -C)
    return con, factors, u_free


def test_some_contacts_active():
    con, _, _ = make_problem()
    assert int(jnp.sum(con.phi < 0)) >= 4  # at least the feet


def test_jacobi_matches_gauss_seidel():
    con, factors, u_free = make_problem()
    u_gs, lam_gs, _ = ct.pgs_solve(con, factors, u_free, MU, DT, iters=30)
    u_j, lam_j, _ = ct.jacobi_solve(con, factors, u_free, MU, DT, iters=60, relax=0.35)
    np.testing.assert_allclose(np.asarray(u_j), np.asarray(u_gs), atol=5e-3)


def _kkt_checks(con, factors, u_free, solver, **kw):
    u_new, lam, _ = solver(con, factors, u_free, MU, DT, **kw)
    S = con.phi.shape[0]
    v = np.asarray((con.Jc.reshape(S * 3, 18) @ u_new).reshape(S, 3))
    lam = np.asarray(lam)
    phi = np.asarray(con.phi)
    active = phi < 0
    depth = np.maximum(-phi - 0.002, 0.0)
    bias = np.minimum(0.2 / DT * depth, 1.0)
    # feasibility
    assert np.all(lam[:, 2] >= -1e-6)
    tn = np.linalg.norm(lam[:, :2], axis=-1)
    assert np.all(tn <= MU * lam[:, 2] + 1e-5)
    # no residual approach velocity at active contacts (within tolerance)
    vn_resid = (v[:, 2] - bias)[active]
    assert np.all(vn_resid > -2e-3), vn_resid
    # complementarity: impulse only where needed
    slack = (v[:, 2] - bias)[active] * lam[active, 2]
    assert np.all(np.abs(slack) < 2e-2), slack


def test_gs_kkt():
    con, factors, u_free = make_problem()
    _kkt_checks(con, factors, u_free, ct.pgs_solve, iters=30)


def test_jacobi_kkt():
    con, factors, u_free = make_problem()
    _kkt_checks(con, factors, u_free, ct.jacobi_solve, iters=40, relax=0.35)


def test_static_friction_holds_on_slope():
    """Standing on a 15deg slope with mu=1.0 must not slide (PD holds pose)."""
    slope = np.tan(np.radians(15.0))
    n = 64
    xs = np.arange(n) * 0.1
    hmap = np.tile(xs[:, None] * slope, (1, n))
    grid = hf.from_numpy(hmap, 0.1, origin_xy=(-3.2, -3.2))
    cfg = eng.EngineConfig()
    ctrl = eng.Control(target=MC.default_dof_pos, kp=jnp.full(12, 40.0), kd=jnp.full(12, 1.0))
    params = eng.EnvParams.nominal()
    z0 = float(hf.sample_height(grid, 0.0, 0.0)) + 0.32
    s = eng.EnvState(
        base_pos=jnp.array([0.0, 0.0, z0]),
        base_quat=jnp.array([0.0, 0.0, 0.0, 1.0]),
        dof_pos=MC.default_dof_pos,
        u=jnp.zeros(18),
    )

    @jax.jit
    def step(st):
        return eng.control_step(MC, cfg, grid, st, ctrl, params)[0]

    for _ in range(100):
        s = step(s)
    assert np.isfinite(np.asarray(s.base_pos)).all()
    # after the impact transient settles, static friction must hold: drift
    # over the next second < 1 cm
    x1 = float(s.base_pos[0])
    for _ in range(50):
        s = step(s)
    assert abs(float(s.base_pos[0]) - x1) < 0.01 * 0.5 + 0.005
    assert float(jnp.linalg.norm(s.u[:3])) < 0.1
