"""Engine health-check utilities."""
import numpy as np
import jax
import jax.numpy as jnp

from agility_tpu.envs.config import smoke_cfg
from agility_tpu.envs.go2_locomotion import Go2LocomotionEnv
from agility_tpu.physics import debug as pdbg


def test_state_health_flags_nonfinite():
    env = Go2LocomotionEnv(smoke_cfg(4))
    s = env.init_state(jax.random.PRNGKey(0))
    h = pdbg.state_health(s.sim)
    assert int(h["nonfinite_envs"]) == 0
    bad = s.sim._replace(base_pos=s.sim.base_pos.at[1, 2].set(jnp.nan))
    h2 = pdbg.state_health(bad)
    assert int(h2["nonfinite_envs"]) == 1


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
