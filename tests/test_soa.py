"""Env-minor (SoA) physics path vs the vmapped oracle.

Every stage of physics/soa.py must reproduce the vmapped engine
(kinematics/dynamics/fastpath) on random batched states: FK/velocities,
composite-CRBA mass solve, bias forces, contact detection, the Jacobi
fixed point, and the full decimated control step.
"""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from agility_tpu.core.urdf import build_go2_model
from agility_tpu.physics import dynamics as dyn
from agility_tpu.physics import engine as eng
from agility_tpu.physics import fastpath as fp
from agility_tpu.physics import heightfield as hf
from agility_tpu.physics import kinematics as kin
from agility_tpu.physics import soa
from agility_tpu.physics.constants import ModelConsts

MODEL = build_go2_model()
MC = ModelConsts.from_model(MODEL)
GRAV = (0.0, 0.0, -9.81)
N = 4


def rand_batch(rng, n=N, z=0.30):
    bp = np.concatenate([rng.normal(0, 0.2, (n, 2)), np.full((n, 1), z)], -1)
    q = rng.normal(0, 0.1, (n, 4)) + np.array([0, 0, 0, 1.0])
    bq = q / np.linalg.norm(q, axis=-1, keepdims=True)
    qj = np.asarray(MC.default_dof_pos) + rng.uniform(-0.3, 0.3, (n, 12))
    u = rng.normal(0, 0.3, (n, 18))
    return eng.EnvState(base_pos=jnp.asarray(bp, jnp.float32),
                        base_quat=jnp.asarray(bq, jnp.float32),
                        dof_pos=jnp.asarray(qj, jnp.float32),
                        u=jnp.asarray(u, jnp.float32))


def soa_links(s):
    c = soa.consts_of(MC)
    bp = tuple(s.base_pos.T)
    bq = tuple(s.base_quat.T)
    return c, soa.fk_vel(c, bp, bq, s.dof_pos.T, s.u.T)


def test_fk_vel_match(rng):
    s = rand_batch(rng)
    c, ls = soa_links(s)
    ref = jax.vmap(lambda bp, bq, q, u: kin.velocities(
        MC, kin.fk(MC, bp, bq, q), u[:3], u[3:6], u[6:]))(
        s.base_pos, s.base_quat, s.dof_pos, s.u)
    for l in range(c.L):
        np.testing.assert_allclose(
            np.stack([np.asarray(x) for x in ls["pos"][l]], -1),
            np.asarray(ref.pos[:, l]), atol=1e-5)
        np.testing.assert_allclose(
            np.stack([np.asarray(x) for x in ls["quat"][l]], -1),
            np.asarray(ref.quat[:, l]), atol=1e-5)
        np.testing.assert_allclose(
            np.stack([np.asarray(x) for x in ls["omega"][l]], -1),
            np.asarray(ref.omega[:, l]), atol=1e-4)
        np.testing.assert_allclose(
            np.stack([np.asarray(x) for x in ls["vel"][l]], -1),
            np.asarray(ref.vel[:, l]), atol=1e-4)


def test_mass_solve_matches(rng):
    s = rand_batch(rng)
    c, ls = soa_links(s)
    com = soa.link_coms(c, ls)
    f = soa.mass_factors(c, ls, com)
    rhs = rng.normal(0, 1.0, (N, 18)).astype(np.float32)
    x = soa.solve(f, [jnp.asarray(rhs[:, i]) for i in range(18)])
    x = np.stack([np.asarray(v) for v in x], -1)   # (N, 18)

    def ref_one(bp, bq, q, u, r):
        lsr = kin.velocities(MC, kin.fk(MC, bp, bq, q), u[:3], u[3:6], u[6:])
        axes = kin.world_axes(MC, lsr)
        M = dyn.mass_matrix(MC, lsr, axes)
        return dyn.solve_mass(dyn.factor_mass_matrix(M), r)

    x_ref = jax.vmap(ref_one)(s.base_pos, s.base_quat, s.dof_pos, s.u,
                              jnp.asarray(rhs))
    np.testing.assert_allclose(x, np.asarray(x_ref), rtol=2e-3, atol=2e-4)


def test_bias_matches(rng):
    s = rand_batch(rng)
    c, ls = soa_links(s)
    com = soa.link_coms(c, ls)
    C = soa.bias_forces(c, ls, com, [s.u.T[6 + d] for d in range(12)], GRAV)
    C = np.stack([np.asarray(v) for v in C], -1)

    def ref_one(bp, bq, q, u):
        lsr = kin.velocities(MC, kin.fk(MC, bp, bq, q), u[:3], u[3:6], u[6:])
        axes = kin.world_axes(MC, lsr)
        return dyn.bias_forces(MC, lsr, axes, u[6:], jnp.asarray(GRAV))

    C_ref = jax.vmap(ref_one)(s.base_pos, s.base_quat, s.dof_pos, s.u)
    np.testing.assert_allclose(C, np.asarray(C_ref), rtol=1e-3, atol=2e-3)


def _full_step_pair(rng, grid, params, n=N):
    s = rand_batch(rng, n)
    control = eng.Control(
        target=jnp.tile(MC.default_dof_pos, (n, 1)),
        kp=jnp.full((n, 12), 40.0), kd=jnp.full((n, 12), 1.0))
    # call the two implementations directly (immune to the AGILITY_ENGINE
    # override the CI conftest sets)
    cfg = eng.EngineConfig()
    out_soa = soa.control_step_batched(MC, cfg, grid, s, control, params)
    out_ref = eng.control_step_batched(MC, cfg, grid, s, control, params)
    return out_soa, out_ref


@pytest.mark.slow
def test_control_step_matches_oracle_rough(rng):
    hmap = (0.08 * rng.normal(size=(48, 48))).astype(np.float32)
    grid = hf.from_numpy(hmap, 0.05, origin_xy=(-1.2, -1.2))
    # randomized per-env params
    params = eng.EnvParams(
        friction=jnp.asarray(rng.uniform(0.4, 1.2, N), jnp.float32),
        kp_scale=jnp.asarray(rng.uniform(0.8, 1.2, (N, 12)), jnp.float32),
        kd_scale=jnp.asarray(rng.uniform(0.8, 1.2, (N, 12)), jnp.float32),
        added_base_mass=jnp.asarray(rng.uniform(0, 1.5, N), jnp.float32),
        base_com_shift=jnp.asarray(rng.uniform(-0.05, 0.05, (N, 3)), jnp.float32),
    )
    out_soa, out_ref = _full_step_pair(rng, grid, params)
    _assert_step_close(out_soa, out_ref)


@pytest.mark.slow
def test_control_step_matches_oracle_flat(rng):
    params = eng.EnvParams(
        friction=jnp.ones(N), kp_scale=jnp.ones((N, 12)),
        kd_scale=jnp.ones((N, 12)), added_base_mass=jnp.zeros(N),
        base_com_shift=jnp.zeros((N, 3)))
    out_soa, out_ref = _full_step_pair(rng, hf.flat_grid(), params)
    _assert_step_close(out_soa, out_ref)


def _assert_step_close(out_soa, out_ref):
    s2, taus, bf, mbf, _ = out_soa
    r2, taus_r, bf_r, mbf_r, _ = out_ref
    np.testing.assert_allclose(np.asarray(s2.base_pos),
                               np.asarray(r2.base_pos), atol=5e-4)
    np.testing.assert_allclose(np.asarray(s2.base_quat),
                               np.asarray(r2.base_quat), atol=5e-4)
    np.testing.assert_allclose(np.asarray(s2.dof_pos),
                               np.asarray(r2.dof_pos), atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2.u), np.asarray(r2.u), atol=3e-2)
    np.testing.assert_allclose(np.asarray(taus[0]), np.asarray(taus_r[0]),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(taus[1]), np.asarray(taus_r[1]),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(bf), np.asarray(bf_r),
                               atol=2.0)   # contact forces are iteration-sensitive
    assert np.isfinite(np.asarray(mbf)).all()


@pytest.mark.slow
def test_soa_stand_is_stable():
    cfg = eng.EngineConfig(soa=True)
    n = 8
    control = eng.Control(
        target=jnp.tile(MC.default_dof_pos, (n, 1)),
        kp=jnp.full((n, 12), 40.0), kd=jnp.full((n, 12), 1.0))
    params = eng.EnvParams(
        friction=jnp.ones(n), kp_scale=jnp.ones((n, 12)),
        kd_scale=jnp.ones((n, 12)), added_base_mass=jnp.zeros(n),
        base_com_shift=jnp.zeros((n, 3)))
    s = eng.EnvState(
        base_pos=jnp.tile(jnp.array([0.0, 0.0, 0.42]), (n, 1)),
        base_quat=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (n, 1)),
        dof_pos=jnp.tile(MC.default_dof_pos, (n, 1)),
        u=jnp.zeros((n, 18)))
    grid = hf.flat_grid()
    step = jax.jit(lambda st: soa.control_step_batched(
        MC, cfg, grid, st, control, params)[0])
    for _ in range(100):
        s = step(s)
    z = np.asarray(s.base_pos[:, 2])
    assert np.isfinite(np.asarray(s.base_pos)).all()
    assert (0.22 < z).all() and (z < 0.40).all()
    assert float(jnp.abs(s.u[:, :6]).max()) < 0.15


@pytest.mark.slow
def test_ceiling_contact_matches_oracle(rng):
    """SoA vs vmap-fastpath parity on an overhang world: both paths must
    produce the same ceiling contact response (fastpath.detect_T ceiling
    rows vs soa ceil_sampler rows)."""
    n = 64
    hmap = np.zeros((n, n), np.float32)
    ceil = np.full((n, n), 0.30, np.float32)   # low roof: trunk presses it
    grid = hf.from_numpy(hmap, 0.05, origin_xy=(-1.6, -1.6), ceiling=ceil)
    params = eng.EnvParams(
        friction=jnp.full(N, 0.8), kp_scale=jnp.ones((N, 12)),
        kd_scale=jnp.ones((N, 12)), added_base_mass=jnp.zeros(N),
        base_com_shift=jnp.zeros((N, 3)))
    s = rand_batch(rng, N, z=0.32)             # base spheres near the roof
    control = eng.Control(
        target=jnp.tile(MC.default_dof_pos, (N, 1)),
        kp=jnp.full((N, 12), 40.0), kd=jnp.full((N, 12), 1.0))
    cfg = eng.EngineConfig()
    out_soa = soa.control_step_batched(MC, cfg, grid, s, control, params)
    out_ref = eng.control_step_batched(MC, cfg, grid, s, control, params)
    _assert_step_close(out_soa, out_ref)
    # the roof actually produced downward force on the trunk somewhere
    bf = np.asarray(out_ref[2])                # (N, B, 3) body forces
    assert bf[:, 0, 2].min() < -1.0

def _warm_vs_cold(rng, grid, z=0.32, atol_pos=3e-3, atol_dof=6e-3,
                  atol_u=0.12, level=False, atol_xy=None):
    """Run several control steps under warm(5 sweeps) and cold(10 sweeps)
    configs on the SoA path and assert they land on the same solution.
    With `atol_xy`, horizontal position gets its own (looser) tolerance
    while z keeps atol_pos — sustained squeeze scenarios have well-defined
    vertical equilibria but iterate-chaotic tangential slip."""
    params = eng.EnvParams(
        friction=jnp.ones(N), kp_scale=jnp.ones((N, 12)),
        kd_scale=jnp.ones((N, 12)), added_base_mass=jnp.zeros(N),
        base_com_shift=jnp.zeros((N, 3)))
    s = rand_batch(rng, N, z=z)
    if level:   # untilted base, rising into the roof (ceiling case: every
        # env must actually engage the overhead contact — a randomly
        # downward-moving env separates without any impulse)
        s = s._replace(
            base_quat=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (N, 1)),
            u=s.u.at[:, 2].set(0.4))
    control = eng.Control(
        target=jnp.tile(MC.default_dof_pos, (N, 1)),
        kp=jnp.full((N, 12), 40.0), kd=jnp.full((N, 12), 1.0))
    cold = eng.EngineConfig()
    warm = eng.EngineConfig(warm_start=True, jacobi_iters=5)
    # jit one step per config (compile once, reuse across the loop)
    step_c = jax.jit(lambda st: soa.control_step_batched(
        MC, cold, grid, st, control, params)[:4])
    step_w = jax.jit(lambda st: soa.control_step_batched(
        MC, warm, grid, st, control, params)[:4])
    # run several control steps so the warm path's carried impulses matter;
    # track the per-substep |force| maximum (body_forces reports only the
    # LAST substep of each decimated step — a transient contact resolved in
    # the first substeps is invisible there)
    sc, sw, mbf = s, s, 0.0
    for _ in range(5):
        sc, _, _, m = step_c(sc)
        sw, _, _, _ = step_w(sw)
        mbf = np.maximum(mbf, np.asarray(m))
    pw, pc = np.asarray(sw.base_pos), np.asarray(sc.base_pos)
    np.testing.assert_allclose(pw[:, 2], pc[:, 2], atol=atol_pos)
    np.testing.assert_allclose(pw[:, :2], pc[:, :2],
                               atol=atol_xy or atol_pos)
    np.testing.assert_allclose(np.asarray(sw.dof_pos),
                               np.asarray(sc.dof_pos), atol=atol_dof)
    np.testing.assert_allclose(np.asarray(sw.u), np.asarray(sc.u),
                               atol=atol_u)
    assert np.isfinite(np.asarray(sw.base_pos)).all()
    return mbf


@pytest.mark.slow
def test_warm_start_matches_cold_solution(rng):
    """warm_start=True with half the Jacobi sweeps must land on the same
    contact solution the cold 10-sweep solve does (it shares the fixed
    point; the previous substep's impulses are just a better initial
    iterate), and a standing robot must stay stable under it."""
    _warm_vs_cold(rng, hf.flat_grid())

@pytest.mark.slow
def test_warm_start_matches_cold_rough(rng):
    """Warm-vs-cold equivalence where contact sets churn: rough terrain
    constantly re-projects stale impulses as feet gain/lose contact, so the
    warm initial iterate must not bias the converged solution (ADVICE r2)."""
    hmap = (0.08 * rng.normal(size=(48, 48))).astype(np.float32)
    grid = hf.from_numpy(hmap, 0.05, origin_xy=(-1.2, -1.2))
    # wider tolerances: iterate counts interact with sliding on slopes, but
    # the trajectories must stay within a small multiple of the flat case
    _warm_vs_cold(rng, grid, z=0.40, atol_pos=8e-3, atol_dof=2e-2, atol_u=0.3)


@pytest.mark.slow
def test_warm_start_matches_cold_ceiling(rng):
    """Warm-vs-cold equivalence with overhang (ceiling) contact rows active:
    the carried impulse vector covers the extra ceiling contacts too and must
    reach the same fixed point (ADVICE r2).  The roof sits at 0.36 m with the
    base at 0.31 m (trunk sphere tops at ~0.367 m): the first substeps
    resolve the 7 mm roof penetration, so the warm path's carried impulses
    include ceiling rows whose contact then breaks — exactly the stale-
    impulse reprojection case.  Vertical state is asserted tightly;
    horizontal slip under the transient bilateral crush is
    iterate-count-chaotic and gets a loose band only."""
    n = 64
    hmap = np.zeros((n, n), np.float32)
    ceil = np.full((n, n), 0.36, np.float32)
    grid = hf.from_numpy(hmap, 0.05, origin_xy=(-1.6, -1.6), ceiling=ceil)
    mbf = _warm_vs_cold(rng, grid, z=0.31, atol_pos=5e-3, atol_dof=5e-2,
                        atol_u=0.6, level=True, atol_xy=3e-2)
    # the roof actually pushed on the trunk at some substep (max_body_forces
    # is a per-substep |force| max; body z force on flat ground can only
    # come from ceiling contact rows)
    assert mbf[:, 0, 2].min() > 0.5


def test_warm_start_fallback_restores_cold_iters(rng):
    """step_batch must not silently run 5 COLD sweeps when a warm-start
    config lands on a path without impulse carry (vmap/pallas): the
    dispatch restores the equivalent cold sweep count (2x), matching the
    validated 10-cold-sweep solution (ADVICE r2 medium)."""
    import os
    params = eng.EnvParams(
        friction=jnp.ones(N), kp_scale=jnp.ones((N, 12)),
        kd_scale=jnp.ones((N, 12)), added_base_mass=jnp.zeros(N),
        base_com_shift=jnp.zeros((N, 3)))
    grid = hf.flat_grid()
    s = rand_batch(rng, N, z=0.32)
    control = eng.Control(
        target=jnp.tile(MC.default_dof_pos, (N, 1)),
        kp=jnp.full((N, 12), 40.0), kd=jnp.full((N, 12), 1.0))
    warm5 = eng.EngineConfig(warm_start=True, jacobi_iters=5)
    cold10 = eng.EngineConfig()          # jacobi_iters=10, warm_start=False
    assert os.environ.get("AGILITY_ENGINE") == "vmap"  # conftest forces vmap
    out_fb = eng.step_batch(MC, warm5, grid, s, control, params)
    out_cold = eng.control_step_batched(MC, cold10, grid, s, control, params)
    np.testing.assert_allclose(np.asarray(out_fb[0].base_pos),
                               np.asarray(out_cold[0].base_pos), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_fb[0].u),
                               np.asarray(out_cold[0].u), atol=1e-5)


@pytest.mark.slow
def test_warm_start_long_horizon_stable():
    grid = hf.flat_grid()
    warm = eng.EngineConfig(warm_start=True, jacobi_iters=5)
    # long-horizon stability at the reduced sweep count
    n = 4
    st = eng.EnvState(
        base_pos=jnp.tile(jnp.array([0.0, 0.0, 0.42]), (n, 1)),
        base_quat=jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0]), (n, 1)),
        dof_pos=jnp.tile(MC.default_dof_pos, (n, 1)),
        u=jnp.zeros((n, 18)))
    ctl = eng.Control(target=jnp.tile(MC.default_dof_pos, (n, 1)),
                      kp=jnp.full((n, 12), 40.0), kd=jnp.full((n, 12), 1.0))
    prm = eng.EnvParams(
        friction=jnp.ones(n), kp_scale=jnp.ones((n, 12)),
        kd_scale=jnp.ones((n, 12)), added_base_mass=jnp.zeros(n),
        base_com_shift=jnp.zeros((n, 3)))
    step = jax.jit(lambda x: soa.control_step_batched(
        MC, warm, grid, x, ctl, prm)[0])
    for _ in range(100):
        st = step(st)
    z = np.asarray(st.base_pos[:, 2])
    assert np.isfinite(np.asarray(st.base_pos)).all()
    assert (0.22 < z).all() and (z < 0.40).all()
    assert float(jnp.abs(st.u[:, :6]).max()) < 0.15
