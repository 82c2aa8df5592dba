"""Terminal discriminator observation semantics.

The reference patches the disc window of a reset env with the disc obs of
the *terminal* physics state (bbc/rsl_rl/runners/on_policy_runner.py:166-181,
terminal states captured in reset_idx).  Our StepOutput.terminal_disc_obs
must therefore equal the disc features of the post-physics, PRE-reset state
of the same step — not the previous step's cached observation.
"""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

import pytest

from agility_tpu.envs.config import smoke_cfg
from agility_tpu.envs.go2_locomotion import Go2LocomotionEnv


@pytest.fixture(scope="module")
def env():
    return Go2LocomotionEnv(smoke_cfg(num_envs=8))


@pytest.fixture(scope="module")
def step(env):
    return jax.jit(env.step)


def _drive_to_reset(env, step, n=8, scale=3.0, max_steps=300):
    """Step with violent random actions until some env terminates.
    Returns (pre_state, actions, out_with_reset)."""
    state = env.init_state(jax.random.PRNGKey(0))
    for i in range(max_steps):
        acts = jax.random.normal(jax.random.PRNGKey(i), (n, 12)) * scale
        prev = state
        state, out = step(state, acts)
        if bool(np.asarray(out.reset).any()):
            return prev, acts, out
    raise AssertionError("no env terminated")


@pytest.mark.slow
def test_terminal_disc_obs_is_pre_reset_state(env, step):
    prev, acts, out = _drive_to_reset(env, step, 8)
    mask = np.asarray(out.reset)

    # replay the exact same step with resets suppressed: its post-step disc
    # obs IS the disc features of the terminal (pre-reset) physics state
    env2 = Go2LocomotionEnv(smoke_cfg(num_envs=8))
    env2._reset_where = lambda s, m, key: s
    _, out_noreset = env2.step(prev, acts)

    np.testing.assert_allclose(
        np.asarray(out.terminal_disc_obs)[mask],
        np.asarray(out_noreset.disc_obs)[mask], rtol=1e-6, atol=1e-6)

    # and it must NOT be the previous step's cached disc obs (the physics
    # advanced one step in between)
    stale = np.asarray(prev.disc_obs)[mask]
    fresh = np.asarray(out.terminal_disc_obs)[mask]
    assert np.abs(stale - fresh).max() > 1e-4


def test_terminal_disc_obs_shape_and_finite(env, step):
    state = env.init_state(jax.random.PRNGKey(0))
    state, out = step(state, jnp.zeros((8, 12)))
    assert out.terminal_disc_obs.shape == (8, 49)
    assert np.isfinite(np.asarray(out.terminal_disc_obs)).all()
