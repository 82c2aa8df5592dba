"""TSC env-layer cost attribution by ablation (PERF_NOTES method): time the
full Go2AgilityEnv.step scan, then re-time with pieces stubbed out (zeros of
the real output shapes via jax.eval_shape).  The deltas attribute the gap
between pure physics (tools/bench_substep.py) and the ~12.8 ms/step env.step
measured by tools/bench_stages_tsc.py.

  BENCH_ENVS=6144 python tools/bench_env_ablate_tsc.py
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

from agility_tpu.envs.go2_agility import Go2AgilityEnv
from agility_tpu.envs.tsc_config import Go2AgilityCfg
from agility_tpu.learn.jitwrap import jit_with_world


def bench(env, label, es, T=48, reps=3):
    def run(es, grid=None):
        def body(es, _):
            act = jnp.tanh(es.obs_buf[:, :12])
            es, out = env.step(es, act, grid=grid)
            return es, out.rew
        return jax.lax.scan(body, es, None, length=T)

    run = jit_with_world(run, env)
    t0 = time.time()
    es2, r = run(es)
    jax.block_until_ready(r)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        es2, r = run(es2)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / reps / T
    print(f"{label:<28} {dt * 1e3:7.2f} ms/step   (compile {compile_s:.0f}s)",
          flush=True)
    return dt


def zeros_like_shape(tree):
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), tree)


def main():
    import dataclasses

    N = int(os.environ.get("BENCH_ENVS", "6144"))
    cfg = Go2AgilityCfg()
    cfg = dataclasses.replace(cfg, env=dataclasses.replace(cfg.env, num_envs=N))

    env = Go2AgilityEnv(cfg)
    es = jit_with_world(env.init_state, env)(jax.random.PRNGKey(1))
    jax.block_until_ready(es.sim.base_pos)
    bench(env, "full step", es)

    # observation assembly stubbed (physics+rewards remain)
    env2 = Go2AgilityEnv(cfg)
    obs_shapes = jax.eval_shape(env2._compute_observations, es)
    env2._compute_observations = lambda state, grid=None: zeros_like_shape(obs_shapes)
    bench(env2, "no _compute_observations", es)

    # scandot measurement stubbed (rest of obs assembly remains)
    env3 = Go2AgilityEnv(cfg)
    mh_shape = jax.eval_shape(
        lambda s: env3._measure_heights(s, s.sim.base_pos, s.sim.base_quat), es)
    env3._measure_heights = lambda state, bp, bq, grid=None: jnp.zeros(
        mh_shape.shape, mh_shape.dtype)
    bench(env3, "no _measure_heights", es)

    # reward library stubbed
    env4 = Go2AgilityEnv(cfg)
    n_rew = env4.n_rew
    env4._compute_reward = lambda q: (jnp.zeros((N,), jnp.float32),
                                      jnp.zeros((N, n_rew), jnp.float32))
    bench(env4, "no _compute_reward", es)

    # reset branch stubbed
    env5 = Go2AgilityEnv(cfg)
    env5._reset_where = lambda state, mask, key: state
    bench(env5, "no _reset_where", es)


if __name__ == "__main__":
    main()
