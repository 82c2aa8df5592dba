"""Full-fidelity checkpoint/resume.

The reference checkpoints actor-critic + estimator + discriminator + SIX
optimizer states + normalizers + iter (bbc/rsl_rl/runners/on_policy_runner.py
:306-339).  Our full-state artifact additionally carries the disc replay
ring, learning/priv-reg counters, task_obs_weight, PRNG key, env state and
the disc window — so save -> load -> train continues BIT-IDENTICALLY to
uninterrupted training.
"""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from agility_tpu.envs.config import smoke_cfg
from agility_tpu.envs.go2_locomotion import Go2LocomotionEnv
from agility_tpu.io import checkpoint as ckpt
from agility_tpu.learn.runner import OnPolicyRunner
from agility_tpu.learn.ssinfogail import AlgoCfg


def _algo_cfg():
    return AlgoCfg(num_preload_transitions=256, disc_replay_buffer_size=1024,
                   num_steps_per_env=8)


def _run_iters(runner, n):
    out = []
    for it in range(runner.current_iteration, runner.current_iteration + n):
        runner.train_state, runner.env_state, runner.disc_hist, m = runner._iter(
            runner.train_state, runner.env_state, runner.disc_hist,
            jnp.asarray(it))
        out.append(jax.device_get(m))
    runner.current_iteration += n
    return out


@pytest.mark.slow
def test_resume_is_bit_identical(tmp_path):
    log_dir = str(tmp_path / "run")
    env = Go2LocomotionEnv(smoke_cfg(num_envs=8))
    r1 = OnPolicyRunner(env, _algo_cfg(), log_dir=log_dir, seed=3)
    _run_iters(r1, 2)
    r1.save(r1.current_iteration)

    # uninterrupted continuation
    m_cont = _run_iters(r1, 3)

    # resumed continuation from the saved artifact (fresh runner, same cfg)
    env2 = Go2LocomotionEnv(smoke_cfg(num_envs=8))
    r2 = OnPolicyRunner(env2, _algo_cfg(), log_dir=log_dir, seed=3)
    path = ckpt.latest(log_dir)
    assert path is not None and ckpt.sibling_state(path) is not None
    r2.load(path)
    assert r2.current_iteration == 2
    m_res = _run_iters(r2, 3)

    for a, b in zip(m_cont, m_res):
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]),
                err_msg=f"metric {k} diverged after resume")


@pytest.mark.slow
def test_slim_fallback_restores_params(tmp_path):
    """A model_<step>.msgpack without its state sibling still restores the
    learned parameters (pre-full-state runs, and the BBC->TSC handoff)."""
    import os

    log_dir = str(tmp_path / "run")
    env = Go2LocomotionEnv(smoke_cfg(num_envs=8))
    r1 = OnPolicyRunner(env, _algo_cfg(), log_dir=log_dir, seed=3)
    _run_iters(r1, 1)
    path = r1.save(r1.current_iteration)
    os.remove(ckpt.sibling_state(path))

    r2 = OnPolicyRunner(env, _algo_cfg(), log_dir=log_dir, seed=4)
    r2.load(path)
    a = jax.tree_util.tree_leaves(r1.train_state.ac_params)
    b = jax.tree_util.tree_leaves(r2.train_state.ac_params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert r2.current_iteration == 1


@pytest.mark.slow
def test_slim_fallback_derives_task_obs_weight(tmp_path):
    """Weights-only resume must NOT restart the task-obs decay: the weight
    is a pure function of the iteration (1 -> 0 over decay_steps, reference
    bbc on_policy_runner.py:224-225), so a slim load at iteration >=
    decay_steps restores 0.0, and a mid-decay load restores the ramp value."""
    log_dir = str(tmp_path / "run")
    env = Go2LocomotionEnv(smoke_cfg(num_envs=8))
    steps = env.cfg.normalization.task_obs_weight_decay_steps
    r1 = OnPolicyRunner(env, _algo_cfg(), log_dir=log_dir, seed=3)
    _run_iters(r1, 1)
    r1.current_iteration = steps * 2          # decay long finished
    path = r1.save(r1.current_iteration, full=False)

    r2 = OnPolicyRunner(env, _algo_cfg(), log_dir=log_dir, seed=4)
    r2.load(path)
    assert float(r2.train_state.task_obs_weight) == 0.0

    r1.current_iteration = steps // 2         # mid-decay
    path = r1.save(r1.current_iteration, full=False)
    r3 = OnPolicyRunner(env, _algo_cfg(), log_dir=log_dir, seed=5)
    r3.load(path)
    np.testing.assert_allclose(float(r3.train_state.task_obs_weight), 0.5,
                               atol=1e-6)


def test_prune_keeps_latest_and_milestones(tmp_path):
    """Rotation for long campaigns (io/checkpoint.prune): newest K stay,
    keep_every milestones stay, everything else is removed."""
    from agility_tpu.io import checkpoint as ckpt

    for step in [100, 200, 5000, 5100, 9900, 10000, 10100, 10200]:
        ckpt.save(str(tmp_path / "model.msgpack"), {"x": [1.0]}, step=step)
    removed = ckpt.prune(str(tmp_path), "model", keep_latest=2, keep_every=5000)
    left = sorted(p.name for p in tmp_path.iterdir())
    assert left == ["model_10000.msgpack", "model_10100.msgpack",
                    "model_10200.msgpack", "model_5000.msgpack"]
    assert removed == 4
    # un-suffixed artifacts and other prefixes are untouched
    ckpt.save(str(tmp_path / "state.msgpack"), {"x": [1.0]}, step=77)
    ckpt.prune(str(tmp_path), "model", keep_latest=1)
    assert (tmp_path / "state_77.msgpack").exists()


def test_midrun_checkpoint_carries_true_iteration(tmp_path):
    """Mid-run checkpoints must store the TRUE iteration (a crash-resume
    renumbering from 0 breaks rotation and the watchdog's resume step
    math — observed in the round-4 campaign); and a resume from an
    artifact that predates iteration tracking falls back to the filename
    step (io/checkpoint.step_of)."""
    from agility_tpu.envs.config import smoke_cfg
    from agility_tpu.envs.go2_locomotion import Go2LocomotionEnv
    from agility_tpu.learn.runner import OnPolicyRunner
    from agility_tpu.learn.ssinfogail import AlgoCfg
    from agility_tpu.io import checkpoint as ckpt

    env = Go2LocomotionEnv(smoke_cfg(num_envs=8))
    cfg = AlgoCfg(num_steps_per_env=2, num_preload_transitions=16,
                  disc_replay_buffer_size=16, num_learning_epochs=1,
                  num_mini_batches=2)
    runner = OnPolicyRunner(env, cfg, log_dir=str(tmp_path), seed=0)
    runner.save_interval = 2
    runner.full_save_interval = 4
    runner.learn(4, init_at_random_ep_len=False, log_every=10)

    tree = ckpt.load_into(str(tmp_path / "model_2.msgpack"),
                          jax.device_get(runner.checkpoint_tree()))
    assert int(tree["iteration"]) == 2
    tree = ckpt.load_into(str(tmp_path / "model_4.msgpack"),
                          jax.device_get(runner.checkpoint_tree()))
    assert int(tree["iteration"]) == 4

    # filename-step fallback for artifacts storing iteration=0
    assert ckpt.step_of("a/model_3900.msgpack") == 3900
    assert ckpt.step_of("a/model.msgpack") is None
    r2 = OnPolicyRunner(env, cfg, log_dir=None, seed=0)
    legacy = jax.device_get(r2.checkpoint_tree())
    legacy["iteration"] = 0
    p = ckpt.save(str(tmp_path / "legacy" / "model.msgpack"), legacy, step=777)
    r2.load(p)
    assert r2.current_iteration == 777
