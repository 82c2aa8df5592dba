"""Dynamics validation: two independent code paths (velocity propagation vs
Jacobians), energy conservation under fine integration, and the structured
mass-matrix solver vs a dense oracle."""
import numpy as np
import jax
import jax.numpy as jnp

from agility_tpu.core.urdf import build_go2_model
from agility_tpu.physics import dynamics as dyn
from agility_tpu.physics import kinematics as kin
from agility_tpu.physics.constants import ModelConsts

MODEL = build_go2_model()
MC = ModelConsts.from_model(MODEL)
GRAV = jnp.array([0.0, 0.0, -9.81])


def rand_state(rng):
    base_pos = jnp.asarray(rng.normal(size=3))
    q = rng.normal(size=4)
    base_quat = jnp.asarray(q / np.linalg.norm(q))
    qj = jnp.asarray(rng.uniform(-1.0, 1.0, size=12))
    u = jnp.asarray(rng.normal(size=18))
    return base_pos, base_quat, qj, u


def full_state(base_pos, base_quat, qj, u):
    ls = kin.fk(MC, base_pos, base_quat, qj)
    ls = kin.velocities(MC, ls, u[:3], u[3:6], u[6:])
    return ls


def kinetic_energy_direct(ls):
    """KE from propagated link velocities — independent of Jacobians."""
    Iw = dyn.world_inertia(MC, ls)
    ke_lin = 0.5 * jnp.sum(MC.link_mass * jnp.sum(ls.vcom**2, axis=-1))
    ke_rot = 0.5 * jnp.sum(ls.omega * jnp.einsum("lab,lb->la", Iw, ls.omega))
    return ke_lin + ke_rot


def test_mass_matrix_matches_direct_kinetic_energy(rng):
    for _ in range(5):
        bp, bq, qj, u = rand_state(rng)
        ls = full_state(bp, bq, qj, u)
        axes = kin.world_axes(MC, ls)
        M = dyn.mass_matrix(MC, ls, axes)
        ke_j = 0.5 * u @ M @ u
        ke_d = kinetic_energy_direct(ls)
        np.testing.assert_allclose(float(ke_j), float(ke_d), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(M), np.asarray(M).T, atol=1e-4)
        # positive definite
        assert np.all(np.linalg.eigvalsh(np.asarray(M, np.float64)) > 0)


def test_leg_blocks_decouple(rng):
    bp, bq, qj, u = rand_state(rng)
    ls = full_state(bp, bq, qj, u)
    M = np.asarray(dyn.mass_matrix(MC, ls, kin.world_axes(MC, ls)))
    for a in range(4):
        for b in range(4):
            if a != b:
                blk = M[6 + 3 * a : 9 + 3 * a, 6 + 3 * b : 9 + 3 * b]
                np.testing.assert_allclose(blk, 0.0, atol=1e-5)


def test_structured_solve_matches_dense(rng):
    bp, bq, qj, u = rand_state(rng)
    ls = full_state(bp, bq, qj, u)
    M = dyn.mass_matrix(MC, ls, kin.world_axes(MC, ls))
    f = dyn.factor_mass_matrix(M)
    rhs = jnp.asarray(rng.normal(size=(18, 7)))
    x = dyn.solve_mass(f, rhs)
    want = np.linalg.solve(np.asarray(M, np.float64), np.asarray(rhs, np.float64))
    np.testing.assert_allclose(np.asarray(x), want, rtol=2e-3, atol=2e-4)
    xv = dyn.solve_mass(f, rhs[:, 0])
    np.testing.assert_allclose(np.asarray(xv), want[:, 0], rtol=2e-3, atol=2e-4)


def _accel(bp, bq, qj, u, tau):
    ls = full_state(bp, bq, qj, u)
    axes = kin.world_axes(MC, ls)
    M = dyn.mass_matrix(MC, ls, axes)
    C = dyn.bias_forces(MC, ls, axes, u[6:], GRAV)
    return dyn.solve_mass(dyn.factor_mass_matrix(M), tau - C)


def total_energy(bp, bq, qj, u):
    ls = full_state(bp, bq, qj, u)
    ke = kinetic_energy_direct(ls)
    pe = jnp.sum(MC.link_mass * 9.81 * ls.com[:, 2])
    return ke + pe


def test_energy_conservation_free_fall(rng):
    """Unactuated free flight: E = KE + PE conserved under RK4 at small dt.
    Exercises the consistency of M, C, and gravity handling together."""
    bp, bq, qj, u = rand_state(rng)
    u = u * 0.3
    tau = jnp.zeros(18)

    @jax.jit
    def rk4_step(carry, dt=1e-3):
        bp, bq, qj, u = carry

        def deriv(s):
            bp_, bq_, qj_, u_ = s
            a = _accel(bp_, bq_, qj_, u_, tau)
            return u_[:3], u_[3:6], u_[6:], a

        def add(s, d, h):
            bp_, bq_, qj_, u_ = s
            dv, dw, dq, du = d
            from agility_tpu.core import quat as qm
            return (bp_ + h * dv, qm.quat_integrate(bq_, dw, h), qj_ + h * dq, u_ + h * du)

        k1 = deriv(carry)
        k2 = deriv(add(carry, k1, dt / 2))
        k3 = deriv(add(carry, k2, dt / 2))
        k4 = deriv(add(carry, k3, dt))
        d = tuple((a + 2 * b + 2 * c + e) / 6 for a, b, c, e in zip(k1, k2, k3, k4))
        return add(carry, d, dt)

    s = (bp, bq, qj, u)
    e0 = float(total_energy(*s))
    for _ in range(100):
        s = rk4_step(s)
    e1 = float(total_energy(*s))
    assert abs(e1 - e0) < 2e-3 * max(1.0, abs(e0)), (e0, e1)


def test_gravity_only_base_acceleration(rng):
    """At rest, with zero torques, the COM must accelerate at exactly g."""
    bp = jnp.array([0.0, 0.0, 1.0])
    bq = jnp.array([0.0, 0.0, 0.0, 1.0])
    qj = MC.default_dof_pos
    u = jnp.zeros(18)
    a = _accel(bp, bq, qj, u, jnp.zeros(18))
    # COM acceleration = sum_l m_l a_com_l / m_total; with qdd free the whole
    # system is in free fall -> every dof of the base accelerates with g and
    # joints see no relative acceleration.
    np.testing.assert_allclose(np.asarray(a[:3]), [0.0, 0.0, -9.81], atol=1e-4)
    np.testing.assert_allclose(np.asarray(a[3:]), 0.0, atol=1e-4)


# ---------------------------------------------------------------------------
# Momentum conservation at dof limits (r5: the r4 trot flight diagnosis).
# The old post-integration hard clamp deleted limb momentum with no reaction
# on the tree — measured |dP| up to 7 kg m/s per substep (vs m g dt = 0.74)
# with joints at the velocity limit, a channel the trot policy pumped into
# 95 m/s ballistic flight.  dynamics.limit_impulses resolves limits with
# joint-space impulses through M^-1, which cannot change total momentum.
# ---------------------------------------------------------------------------


def _flight_momentum_worst(amp, n_steps=25, seed=0):
    """Worst per-substep |dP - m g dt| with violent random PD targets in
    free flight (no contact possible: spawned 50 m up on a flat grid)."""
    from agility_tpu.physics import engine as eng
    from agility_tpu.physics import heightfield as hf

    cfg = eng.EngineConfig(fast=True, soa=False)
    grid = hf.from_numpy(np.zeros((16, 16), np.float32), 0.5, (0.0, 0.0))
    m_tot = float(np.sum(np.asarray(MC.link_mass)))

    def momentum(s):
        ls = full_state(s.base_pos, s.base_quat, s.dof_pos, s.u)
        return jnp.sum(MC.link_mass[:, None] * ls.vcom, axis=0)

    s = eng.EnvState(
        base_pos=jnp.asarray([4.0, 4.0, 50.0]),
        base_quat=jnp.asarray([0.0, 0.0, 0.0, 1.0]),
        dof_pos=MC.default_dof_pos,
        u=jnp.zeros(18),
    )
    params = eng.EnvParams.nominal()
    key = jax.random.PRNGKey(seed)
    worst = 0.0
    substep = jax.jit(lambda st, tg: eng.substep(
        MC, cfg, grid, st, eng.Control(
            target=tg, kp=jnp.full(12, 40.0), kd=jnp.full(12, 1.0)),
        params))
    for _ in range(n_steps):
        key, k = jax.random.split(key)
        tg = MC.default_dof_pos + amp * jax.random.uniform(
            k, (12,), minval=-1, maxval=1)
        P0 = momentum(s)
        s, _, _ = substep(s, tg)
        dP = np.asarray(momentum(s) - P0)
        err = np.abs(dP - np.array([0.0, 0.0, m_tot * -9.81 * cfg.dt])).max()
        worst = max(worst, float(err))
    return worst, s


def test_flight_momentum_quiet():
    """No torques -> exact momentum conservation (gravity only)."""
    worst, _ = _flight_momentum_worst(0.0, n_steps=10)
    assert worst < 1e-4, worst


def test_flight_momentum_at_limits():
    """Violent targets slam joints into position/velocity limits; the limit
    impulses must keep the per-substep momentum error within the O(dt^2)
    integrator band (the OLD clamp produced several kg m/s here)."""
    worst, s = _flight_momentum_worst(5.0, n_steps=25)
    assert worst < 2.0, worst
    # limits themselves still enforced
    q = np.asarray(s.dof_pos)
    assert (q >= np.asarray(MC.dof_limit_lower) - 1e-5).all()
    assert (q <= np.asarray(MC.dof_limit_upper) + 1e-5).all()
    assert (np.abs(np.asarray(s.u[6:]))
            <= np.asarray(MC.dof_velocity_limit) + 1e-4).all()
