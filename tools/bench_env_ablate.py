"""Env-layer cost attribution by ablation (PERF_NOTES method): time the
full env.step scan, then re-time with individual pieces stubbed out
(monkeypatched to shape-compatible zeros / identities).  The deltas
attribute the ~4.5 ms/step gap between pure physics (tools/bench_engine.py)
and full env.step (tools/bench_env.py).

  BENCH_ENVS=4096 python tools/bench_env_ablate.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from agility_tpu.envs.config import Go2LocomotionCfg, EnvCfg, TerrainCfg
from agility_tpu.envs.go2_locomotion import Go2LocomotionEnv


def bench(env, label, T=48, reps=3):
    es = jax.jit(env.init_state)(jax.random.PRNGKey(1))
    jax.block_until_ready(es.sim.base_pos)

    @jax.jit
    def run(es):
        def body(es, _):
            act = jnp.tanh(es.obs_buf[:, :12])
            es, out = env.step(es, act)
            return es, out.rew
        return jax.lax.scan(body, es, None, length=T)

    t0 = time.time()
    es2, r = run(es)
    jax.block_until_ready(r)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        es2, r = run(es2)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / reps / T
    print(f"{label:<26} {dt * 1e3:7.2f} ms/step   (compile {compile_s:.0f}s)",
          flush=True)
    return dt


def main():
    N = int(os.environ.get("BENCH_ENVS", "4096"))
    cfg = Go2LocomotionCfg(
        env=EnvCfg(num_envs=N),
        terrain=TerrainCfg(num_rows=4, num_cols=4, border_size=10.0))

    env = Go2LocomotionEnv(cfg)
    base = bench(env, "full step")

    # mocap reset -> default-state reset (isolates the frame-table gathers)
    import dataclasses

    cfg_nm = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, mocap_state_init=False))
    bench(Go2LocomotionEnv(cfg_nm), "reset w/o mocap frames")

    # no reset branch at all
    env2 = Go2LocomotionEnv(cfg)
    env2._reset_where = lambda state, mask, key: state
    bench(env2, "no _reset_where")

    # observation assembly stubbed (keeps shapes; physics+rewards remain)
    env3 = Go2LocomotionEnv(cfg)
    n_obs = cfg.env.num_actor_obs

    def obs_stub(state, key):
        z = jnp.zeros((N, n_obs), jnp.float32)
        return z, z, jnp.zeros((N, 49), jnp.float32), state.obs_history

    env3._compute_observations = obs_stub
    bench(env3, "no _compute_observations")

    # reward library stubbed
    env4 = Go2LocomotionEnv(cfg)
    n_rew = env.n_rew
    env4._compute_reward = lambda q: (jnp.zeros((N,), jnp.float32),
                                      jnp.zeros((N, n_rew), jnp.float32))
    bench(env4, "no _compute_reward")

    # root-height sampling stubbed
    env5 = Go2LocomotionEnv(cfg)
    env5._center_root_height = lambda bp, bq: bp[:, 2]
    bench(env5, "no _center_root_height")


if __name__ == "__main__":
    main()
