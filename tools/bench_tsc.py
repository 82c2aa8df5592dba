"""TSC teacher training-iteration throughput on the ambient accelerator.

The second BASELINE-derived number: the reference's TSC teacher trains at
~61k env-steps/s on a 3090 (6144 envs x 24 steps x 30k iters / 20 h,
BASELINE.md).  Measures the full hierarchical iteration: TSC policy ->
set_commands -> frozen BBC -> obstacle-course env step (SoA engine with
ceiling/lever surfaces) -> frozen-disc reward -> hybrid PPO update.

  BENCH_ENVS=6144 python tools/bench_tsc.py
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


def main():
    from agility_tpu.learn.jitwrap import jit_with_world
    from agility_tpu.envs.go2_agility import Go2AgilityEnv
    from agility_tpu.envs.tsc_config import Go2AgilityCfg
    from agility_tpu.learn.ppo_tsc import TscAlgoCfg, TscPPO
    from agility_tpu.learn.runner_tsc import load_bbc_frozen

    N = int(os.environ.get("BENCH_ENVS", "6144"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))

    import dataclasses

    cfg = Go2AgilityCfg()
    cfg = dataclasses.replace(cfg, env=dataclasses.replace(cfg.env, num_envs=N))
    env = Go2AgilityEnv(cfg)
    bbc = load_bbc_frozen(None, seed=0)
    alg = TscPPO(env, bbc, TscAlgoCfg())
    ts = jax.jit(alg.init_train_state)(jax.random.PRNGKey(0))
    es = jit_with_world(env.init_state, env)(jax.random.PRNGKey(1))
    dh = jnp.repeat(es.disc_obs[:, None], 2, axis=1)
    jax.block_until_ready(es.sim.base_pos)
    print(f"N={N}; compiling train_iteration", file=sys.stderr, flush=True)

    it_fn = jit_with_world(alg.train_iteration, env)
    t0 = time.time()
    ts, es, dh, m = it_fn(ts, es, dh, jnp.asarray(1))
    jax.block_until_ready(m)
    print(f"compile+first {time.time() - t0:.1f}s", file=sys.stderr, flush=True)

    t0 = time.time()
    prof = os.environ.get("BENCH_PROFILE", "")
    if prof:
        jax.profiler.start_trace(prof)
        t0 = time.time()
    for i in range(iters):
        ts, es, dh, m = it_fn(ts, es, dh, jnp.asarray(i + 2))
    jax.block_until_ready(m)
    dt = (time.time() - t0) / iters
    if prof:
        jax.profiler.stop_trace()
        print(f"trace written to {prof}", file=sys.stderr)
    steps = alg.cfg.num_steps_per_env * N
    print(f"tsc teacher: {dt * 1e3:.1f} ms/iter -> {steps / dt:,.0f} "
          f"env-steps/s (vs 61k 3090-derived: {steps / dt / 61000:.2f}x)")


if __name__ == "__main__":
    main()
