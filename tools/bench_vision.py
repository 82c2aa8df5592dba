"""TSC vision-student training-iteration throughput.

Third BASELINE-derived number: the reference's depth student trains
~15k iterations in ~17 h on a 3090 (README.md:61).  At its 192
camera-envs x 24 steps that derives to ~1.2k env-steps/s; at our full
6144-env student config the budget-equivalent figure is ~36k.  Measures
the full student iteration: depth ray-cast render every update_interval
steps -> GRU encoder (held between refreshes) -> student heads ->
set_commands -> frozen BBC -> env step -> distillation + BYOL update.

  BENCH_ENVS=1024 python tools/bench_vision.py
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
    import dataclasses

    from agility_tpu.learn.jitwrap import jit_with_world
    from agility_tpu.envs.go2_agility import Go2AgilityEnv
    from agility_tpu.envs.tsc_config import Go2AgilityCfg
    from agility_tpu.learn.ppo_tsc import TscAlgoCfg, TscPPO
    from agility_tpu.learn.runner_tsc import load_bbc_frozen
    from agility_tpu.learn.vision_tsc import TscVision, VisionCfg

    N = int(os.environ.get("BENCH_ENVS", "1024"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))

    cfg = Go2AgilityCfg()
    cfg = dataclasses.replace(cfg, env=dataclasses.replace(cfg.env, num_envs=N))
    env = Go2AgilityEnv(cfg)
    bbc = load_bbc_frozen(None, seed=0)
    alg = TscPPO(env, bbc, TscAlgoCfg())
    ts_t = jax.jit(alg.init_train_state)(jax.random.PRNGKey(0))
    vision = TscVision(env, alg, ts_t.ac_params, ts_t.est_params,
                       VisionCfg(), seed=0)
    ts = vision.init_train_state(jax.random.PRNGKey(0))
    es = jit_with_world(env.init_state, env)(jax.random.PRNGKey(1))
    jax.block_until_ready(es.sim.base_pos)
    print(f"N={N}; compiling vision train_iteration", file=sys.stderr,
          flush=True)

    it_fn = jit_with_world(vision.train_iteration, env)
    t0 = time.time()
    ts, es, m = it_fn(ts, es)
    jax.block_until_ready(m["vision/actor"])
    print(f"compile+first {time.time() - t0:.1f}s", file=sys.stderr, flush=True)

    t0 = time.time()
    for _ in range(iters):
        ts, es, m = it_fn(ts, es)
    jax.block_until_ready(m["vision/actor"])
    dt = (time.time() - t0) / iters
    steps = vision.cfg.num_steps_per_env * N
    print(f"vision student: {dt * 1e3:.1f} ms/iter -> {steps / dt:,.0f} "
          f"env-steps/s")


if __name__ == "__main__":
    main()
