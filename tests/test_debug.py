"""Engine health-check utilities."""
import numpy as np
import jax
import jax.numpy as jnp

from agility_tpu.physics import debug as pdbg


def test_state_health_flags_nonfinite():
    # state_health only needs an EnvState-shaped pytree — building a full
    # env here cost a ~20 s eager init for no extra coverage
    from agility_tpu.physics import engine as eng

    sim = eng.EnvState(
        base_pos=jnp.zeros((4, 3)).at[:, 2].set(0.35),
        base_quat=jnp.zeros((4, 4)).at[:, 3].set(1.0),
        dof_pos=jnp.zeros((4, 12)),
        u=jnp.zeros((4, 18)))
    h = pdbg.state_health(sim)
    assert int(h["nonfinite_envs"]) == 0
    bad = sim._replace(base_pos=sim.base_pos.at[1, 2].set(jnp.nan))
    h2 = pdbg.state_health(bad)
    assert int(h2["nonfinite_envs"]) == 1
    # speed gate: quiet state passes; one ballistic env is flagged
    g = pdbg.speed_gate(sim)
    assert float(g["overspeed_frac"]) == 0.0
    fast = sim._replace(u=sim.u.at[2, 0].set(40.0))
    g2 = pdbg.speed_gate(fast)
    assert abs(float(g2["overspeed_frac"]) - 0.25) < 1e-6
    assert float(g2["max_base_speed"]) > 39.0


def test_checked_catches_nan():
    """checkify wrapping surfaces non-finite intermediates with a message
    (used to hunt solver NaNs on small reproductions)."""

    def solver_like(x):
        y = jnp.sqrt(x)          # nan for x < 0
        pdbg.assert_finite("solver", y)
        return y * 2.0

    checked = jax.jit(pdbg.checked(solver_like))
    err, out = checked(jnp.asarray([4.0, 9.0]))
    err.throw()  # no error
    err2, _ = checked(jnp.asarray([-1.0, 4.0]))
    try:
        err2.throw()
        raised = False
    except Exception as e:
        raised = "nan" in str(e).lower() or "solver" in str(e)
    assert raised
