"""End-to-end BBC training smoke test (tiny scale, CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from agility_tpu.envs.config import smoke_cfg
from agility_tpu.envs.go2_locomotion import Go2LocomotionEnv
from agility_tpu.learn.runner import OnPolicyRunner
from agility_tpu.learn.ssinfogail import AlgoCfg


@pytest.fixture(scope="module")
def runner(tmp_path_factory):
    env = Go2LocomotionEnv(smoke_cfg(num_envs=8))
    cfg = AlgoCfg(
        num_steps_per_env=8,
        num_preload_transitions=256,
        disc_replay_buffer_size=512,
        num_learning_epochs=2,
        num_mini_batches=2,
    )
    log_dir = str(tmp_path_factory.mktemp("bbc_logs"))
    return OnPolicyRunner(env, cfg, log_dir=log_dir, seed=0)


def test_training_runs_and_is_finite(runner):
    runner.learn(3, init_at_random_ep_len=False, log_every=1)
    ts = runner.train_state
    flat, _ = jax.flatten_util.ravel_pytree(ts.ac_params)
    assert np.isfinite(np.asarray(flat)).all()
    flat_d, _ = jax.flatten_util.ravel_pytree(ts.disc_params)
    assert np.isfinite(np.asarray(flat_d)).all()
    # replay ring received rollout transitions
    assert int(ts.ring.size) == 3 * 8 * 8  # iters * T * N
    # normalizer updated
    assert float(ts.disc_norm["count"]) > 1.0


def test_checkpoint_roundtrip(runner, tmp_path):
    p = runner.save(3)
    before = jax.device_get(runner.train_state.ac_params)
    runner.load(p)
    after = jax.device_get(runner.train_state.ac_params)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), before, after)


def test_inference_policy(runner):
    policy = runner.get_inference_policy()
    obs = runner.env_state.obs_buf
    acts = policy(obs)
    assert acts.shape == (8, 12)
    assert np.isfinite(np.asarray(acts)).all()
