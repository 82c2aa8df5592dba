"""Benchmark: BBC training throughput on the ambient accelerator.

Prints ONE JSON line:
  {"metric": "env_steps_per_sec", "value": N, "unit": "env-steps/s",
   "vs_baseline": N / 57000}

Baseline: the reference's derived RTX 3090 BBC training throughput,
~57k env-steps/s at 4096 envs (BASELINE.md).  Measured here as full
training-iteration throughput (rollout + PPO + discriminator updates)
at 4096 envs, the same accounting the baseline derives from.

The run is split into phases with stderr heartbeats so a supervising
timeout can see progress; all jitted computations go through the
persistent compilation cache (primed by an in-session run with the same
shapes, so a cold driver run only loads compiled binaries).

Env knobs:
  BENCH_ENVS   (default 4096)  env count
  BENCH_ITERS  (default 5)     measured iterations
  BENCH_FAST   (default 0)     1 = shrink the *setup* compile surface
                               (expert preload size, replay ring) without
                               touching the measured train iteration
  BENCH_COLD   (default 0)     1 = disable contact warm-start (10 cold
                               Jacobi sweeps; A/B knob — warm-start is the
                               shipped default, measured 684.0k vs 651.7k)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_T0 = time.time()


def _beat(msg):
    sys.stderr.write(f"[bench +{time.time() - _T0:7.1f}s] {msg}\n")
    sys.stderr.flush()


_beat("start")

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

_beat(f"jax imported, backend={jax.default_backend()}")


def main():
    from agility_tpu.learn.jitwrap import jit_with_world
    from agility_tpu.envs.config import Go2LocomotionCfg, EnvCfg, TerrainCfg
    from agility_tpu.envs.go2_locomotion import Go2LocomotionEnv
    from agility_tpu.learn.ssinfogail import AlgoCfg, SSInfoGAIL

    num_envs = int(os.environ.get("BENCH_ENVS", "4096"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))
    fast = os.environ.get("BENCH_FAST", "0") == "1"

    # full BBC configuration (rough terrain, domain rand, mocap init) at the
    # reference's env count; synthetic gait data keeps the bench hermetic
    cfg = Go2LocomotionCfg(
        env=EnvCfg(num_envs=num_envs),
        terrain=TerrainCfg(num_rows=4, num_cols=4, border_size=10.0),
    )
    if os.environ.get("BENCH_COLD", "0") == "1":
        import dataclasses

        from agility_tpu.envs.config import SimCfg

        cfg = dataclasses.replace(
            cfg, sim=SimCfg(warm_start=False, jacobi_iters=10))
    env = Go2LocomotionEnv(cfg)
    _beat("env built")
    # BENCH_FAST shrinks only setup-time compile surface (preload jits);
    # the measured train_iteration is identical either way
    preload = 4096 if fast else 50_000
    algo_cfg = AlgoCfg(num_preload_transitions=preload,
                       disc_replay_buffer_size=(500_000 // num_envs) * num_envs)
    alg = SSInfoGAIL(env, algo_cfg, seed=0)
    _beat("alg built (expert transitions preloaded)")

    ts = jax.jit(alg.init_train_state)(jax.random.PRNGKey(0))
    es = jit_with_world(env.init_state, env)(jax.random.PRNGKey(1))
    dh = jnp.repeat(es.disc_obs[:, None], cfg.env.disc_obs_len, axis=1)
    jax.block_until_ready(es.sim.base_pos)
    _beat("states initialized; compiling train_iteration")

    it_fn = jit_with_world(alg.train_iteration, env)
    t0 = time.time()
    ts, es, dh, metrics = it_fn(ts, es, dh, jnp.asarray(1))
    jax.block_until_ready(metrics)
    _beat(f"compile+first iter done ({time.time() - t0:.1f}s); measuring {iters} iters")

    t0 = time.time()
    for i in range(iters):
        ts, es, dh, metrics = it_fn(ts, es, dh, jnp.asarray(i + 2))
    jax.block_until_ready(metrics)
    dt = (time.time() - t0) / iters

    steps_per_iter = algo_cfg.num_steps_per_env * num_envs
    env_steps_per_sec = steps_per_iter / dt
    baseline = 57000.0
    # secondary kernel metric (BASELINE.json): one contact-LCP block is
    # solved per env per physics substep (decimation 4 per control step)
    solves_per_sec = env_steps_per_sec * cfg.control.decimation
    _beat(f"measured {dt * 1e3:.1f} ms/iter")
    sys.stderr.write(f"contact_qp_solves_per_sec: {solves_per_sec:,.0f}\n")
    print(json.dumps({
        "metric": "env_steps_per_sec",
        "value": round(env_steps_per_sec, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(env_steps_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
