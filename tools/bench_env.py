"""Env-layer throughput: full env.step (physics + obs + rewards + resets)
vs pure physics, isolating the env-layer overhead the rollout pays on top
of the engine (tools/bench_engine.py) and what the policy/disc add
(tools/bench_stages.py).

  BENCH_ENVS=4096 python tools/bench_env.py
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


def main():
    N = int(os.environ.get("BENCH_ENVS", "4096"))
    T = int(os.environ.get("BENCH_STEPS", "48"))

    cfg = Go2LocomotionCfg(
        env=EnvCfg(num_envs=N),
        terrain=TerrainCfg(num_rows=4, num_cols=4, border_size=10.0))
    env = Go2LocomotionEnv(cfg)
    es = jax.jit(env.init_state)(jax.random.PRNGKey(1))
    jax.block_until_ready(es.sim.base_pos)

    @jax.jit
    def run(es):
        def body(es, _):
            # cheap state-dependent action keeps the loop un-hoistable
            act = jnp.tanh(es.obs_buf[:, :12])
            es, out = env.step(es, act)
            return es, out.rew
        es, rews = jax.lax.scan(body, es, None, length=T)
        return es, rews

    t0 = time.time()
    es2, rews = run(es)
    jax.block_until_ready(rews)
    print(f"compile {time.time() - t0:.0f}s", flush=True)

    t0 = time.time()
    reps = 3
    for _ in range(reps):
        es2, rews = run(es2)
    jax.block_until_ready(rews)
    dt = (time.time() - t0) / reps / T
    print(f"env.step: {dt * 1e3:.2f} ms/control-step @ {N} envs "
          f"-> {N / dt:,.0f} env-steps/s (physics+obs+rewards+resets)")


if __name__ == "__main__":
    main()
