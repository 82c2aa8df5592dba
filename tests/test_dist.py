"""Sharded-vs-single-device equivalence on the virtual 8-device CPU mesh —
the standard way to validate pod-slice code without a pod (SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from agility_tpu.dist import mesh as dist_mesh
from agility_tpu.envs.config import smoke_cfg
from agility_tpu.envs.go2_locomotion import Go2LocomotionEnv
from agility_tpu.learn.ssinfogail import AlgoCfg, SSInfoGAIL


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_env_step_matches_single_device():
    env = Go2LocomotionEnv(smoke_cfg(num_envs=16))
    key = jax.random.PRNGKey(0)
    state = env.init_state(key)
    acts = jax.random.normal(jax.random.PRNGKey(1), (16, 12)) * 0.1

    step = jax.jit(env.step)
    s_ref, out_ref = step(state, acts)

    m = dist_mesh.make_mesh()
    state_sh = dist_mesh.shard_env_tree(state, m, 16)
    acts_sh = jax.device_put(acts, dist_mesh.env_sharding(m))
    s_sh, out_sh = step(state_sh, acts_sh)

    np.testing.assert_allclose(
        np.asarray(out_sh.obs), np.asarray(out_ref.obs), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_sh.rew), np.asarray(out_ref.rew), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_sh.sim.base_pos), np.asarray(s_ref.sim.base_pos), atol=1e-5)


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_train_iteration_runs_and_matches():
    env = Go2LocomotionEnv(smoke_cfg(num_envs=16))
    cfg = AlgoCfg(num_steps_per_env=4, num_preload_transitions=128,
                  disc_replay_buffer_size=256, num_learning_epochs=1,
                  num_mini_batches=2)
    alg = SSInfoGAIL(env, cfg, seed=0)
    ts = alg.init_train_state(jax.random.PRNGKey(1))
    es = env.init_state(jax.random.PRNGKey(2))
    dh = jnp.repeat(es.disc_obs[:, None], 2, axis=1)

    it_fn = jax.jit(alg.train_iteration)
    ts_ref, es_ref, dh_ref, m_ref = it_fn(ts, es, dh, jnp.asarray(1))

    m = dist_mesh.make_mesh()
    es_sh = dist_mesh.shard_env_tree(es, m, 16)
    dh_sh = jax.device_put(dh, dist_mesh.env_sharding(m))
    ts_sh = dist_mesh.replicate_tree(ts, m)
    ts2, es2, dh2, m_sh = it_fn(ts_sh, es_sh, dh_sh, jnp.asarray(1))

    # rollout-derived metrics must match closely; param updates involve
    # reductions whose order differs across shardings -> loose tolerance
    np.testing.assert_allclose(
        float(m_sh["rollout/r_total"]), float(m_ref["rollout/r_total"]), rtol=1e-4)
    flat_ref, _ = jax.flatten_util.ravel_pytree(ts_ref.ac_params)
    flat_sh, _ = jax.flatten_util.ravel_pytree(ts2.ac_params)
    np.testing.assert_allclose(np.asarray(flat_sh), np.asarray(flat_ref),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_tsc_env_step_matches_single_device():
    """Go2AgilityEnv (obstacle-course world, hierarchical bridge) under
    ("env",) sharding: step outputs must match the single-device run
    (VERDICT r3 item 5 — the TSC stack had no multi-device coverage)."""
    from agility_tpu.envs.go2_agility import Go2AgilityEnv
    from agility_tpu.envs.tsc_config import tsc_smoke_cfg

    env = Go2AgilityEnv(tsc_smoke_cfg(num_envs=16, courses=2))
    state = env.init_state(jax.random.PRNGKey(0))
    hl = jax.random.normal(jax.random.PRNGKey(1), (16, 19)) * 0.1
    set_cmd = jax.jit(env.set_commands)
    step = jax.jit(env.step)

    s_ref, _ = set_cmd(state, hl)
    s_ref, out_ref = step(s_ref, jnp.zeros((16, 12)))

    m = dist_mesh.make_mesh()
    state_sh = dist_mesh.shard_env_tree(state, m, 16)
    hl_sh = jax.device_put(hl, dist_mesh.env_sharding(m))
    s_sh, _ = set_cmd(state_sh, hl_sh)
    s_sh, out_sh = step(s_sh, jax.device_put(jnp.zeros((16, 12)),
                                             dist_mesh.env_sharding(m)))

    np.testing.assert_allclose(
        np.asarray(out_sh.obs), np.asarray(out_ref.obs), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_sh.rew), np.asarray(out_ref.rew), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_sh.sim.base_pos), np.asarray(s_ref.sim.base_pos), atol=1e-5)
