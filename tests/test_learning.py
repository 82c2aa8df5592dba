"""Learning-curve gate (BASELINE configs[0]): flat ground, walk mode,
task-reward-only PPO — the mean task reward must INCREASE over a short
CPU-runnable training run.  This asserts that learning happens, not just
that the jitted iteration runs (round-1 VERDICT weak #6).

Calibration (CPU, seed 0, fixed lr 5e-4, 256 envs): r_t first-20 mean
~8e-4, rises to ~0.21e-1 by iter 80 and ~0.31e-1 by iter 100 (~39x) —
the 4x assertion below has a wide margin.  The adaptive-KL LR schedule
collapses the LR to 1e-5 at this batch size (measured), hence the fixed
schedule (the reference's non-adaptive branch, gail.py:367-379).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agility_tpu.envs.config import smoke_cfg
from agility_tpu.envs.go2_locomotion import Go2LocomotionEnv
from agility_tpu.learn.ssinfogail import AlgoCfg, SSInfoGAIL


@pytest.mark.slow
def test_reward_increases_flat_walk():
    env = Go2LocomotionEnv(smoke_cfg(num_envs=256))
    # PPO only (no AMP): zero the discriminator reward mix so the optimized
    # signal is purely the task reward being asserted on
    cfg = AlgoCfg(
        num_steps_per_env=24,
        num_preload_transitions=64,
        disc_replay_buffer_size=24 * 256,
        lr_ac=5e-4, lr_schedule="fixed",
        reward_i_coef=0.0, reward_us_coef=0.0, reward_ss_coef=0.0,
        reward_t_coef=1.0,
    )
    alg = SSInfoGAIL(env, cfg, seed=0)
    ts = alg.init_train_state(jax.random.PRNGKey(0))
    es = env.init_state(jax.random.PRNGKey(1))
    dh = jnp.repeat(es.disc_obs[:, None], env.cfg.env.disc_obs_len, axis=1)

    it_fn = jax.jit(alg.train_iteration)
    r_t = []
    for i in range(110):
        ts, es, dh, metrics = it_fn(ts, es, dh, jnp.asarray(i))
        r_t.append(float(metrics["rollout/r_t"]))

    r_t = np.asarray(r_t)
    assert np.isfinite(r_t).all(), r_t
    early = r_t[:20].mean()
    late = r_t[-20:].mean()
    assert late > early * 4.0, (
        f"task reward did not increase: early={early:.5f} late={late:.5f}\n{r_t}")


def test_switched_actor_matches_two_pass():
    """action_mean_switch / heads_switch (single-trunk DAgger switch on a
    traced flag) must be bit-identical to the two-pass + select form they
    replaced in the rollouts."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from agility_tpu.learn import networks as nets
    from agility_tpu.learn import networks_tsc as tnets

    s = nets.ObsSlices(57, 4, 29, 10, 11)
    ac = nets.ActorCritic(num_actions=12, slices=s)
    obs0 = jnp.zeros((1, s.total))
    params = ac.init(jax.random.PRNGKey(0), obs0, obs0)
    obs = jax.random.normal(jax.random.PRNGKey(1), (8, s.total))
    for flag in (True, False):
        ref = ac.apply(params, obs, method="action_mean", hist_encoding=flag)
        got = ac.apply(params, obs, jnp.asarray(flag), method="action_mean_switch")
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    ts = tnets.TscObsSlices()
    tac = tnets.ActorCriticTSC(slices=ts)
    tobs0 = jnp.zeros((1, ts.total))
    tparams = tac.init(jax.random.PRNGKey(0), tobs0, tobs0)
    tobs = jax.random.normal(jax.random.PRNGKey(2), (8, ts.total))
    for flag in (True, False):
        d_ref, c_ref, std_ref = tac.apply(tparams, tobs, method="heads",
                                          hist_encoding=flag)
        d, c, std = tac.apply(tparams, tobs, jnp.asarray(flag),
                              method="heads_switch")
        np.testing.assert_array_equal(np.asarray(d), np.asarray(d_ref))
        np.testing.assert_array_equal(np.asarray(c), np.asarray(c_ref))
        np.testing.assert_array_equal(np.asarray(std), np.asarray(std_ref))
