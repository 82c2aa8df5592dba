"""Benchmark: BBC + TSC-teacher training throughput on the ambient accelerator.

Prints one JSON line per stack (BBC first — the headline metric):
  {"metric": "env_steps_per_sec", "value": N, "unit": "env-steps/s",
   "vs_baseline": N / 57000}
  {"metric": "tsc_env_steps_per_sec", "value": N, "unit": "env-steps/s",
   "vs_baseline": N / 61000}

Baselines: the reference's derived RTX 3090 training throughputs —
~57k env-steps/s for BBC at 4096 envs and ~61k for the TSC teacher at
6144 envs (BASELINE.md).  Both measured as full training-iteration
throughput (rollout + PPO (+ discriminator) updates), the same
accounting the baselines derive from.

Backend init is retried (the round-3 driver record was lost to one
transient "Unable to initialize backend 'axon': UNAVAILABLE" raised by
the remote-TPU tunnel, BENCH_r03.json): on failure the script re-execs
itself with backoff up to BENCH_INIT_TRIES attempts, so a flaky tunnel
costs seconds, not the round's perf record.  On terminal failure it
still prints a well-formed JSON line with value 0 and an "error" field.

The run is split into phases with stderr heartbeats so a supervising
timeout can see progress; all jitted computations go through the
persistent compilation cache (primed by an in-session run with the same
shapes, so a cold driver run only loads compiled binaries).

Env knobs:
  BENCH_ENVS       (default 4096)  BBC env count
  BENCH_TSC_ENVS   (default 6144)  TSC env count
  BENCH_ITERS      (default 5)     measured iterations
  BENCH_TSC        (default 1)     0 = skip the TSC teacher line
  BENCH_FAST       (default 0)     1 = shrink the *setup* compile surface
                                   (expert preload size, replay ring) without
                                   touching the measured train iteration
  BENCH_COLD       (default 0)     1 = disable contact warm-start (10 cold
                                   Jacobi sweeps; A/B knob — warm-start is the
                                   shipped default, measured 684.0k vs 651.7k)
  BENCH_INIT_TRIES (default 5)     backend-init attempts before giving up
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


def _fail_json(err):
    """Terminal failure: still emit well-formed scoreboard lines."""
    for metric, base in (("env_steps_per_sec", 57000.0),
                         ("tsc_env_steps_per_sec", 61000.0)):
        print(json.dumps({"metric": metric, "value": 0.0,
                          "unit": "env-steps/s", "vs_baseline": 0.0,
                          "error": str(err)[:500]}))


_beat("start")

import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _init_backend_or_reexec():
    """First device touch, with retry-by-reexec.

    Backend init failure leaves jax's xla_bridge in a poisoned cached
    state, so an in-process retry would see the same error; re-exec gives
    each attempt a clean process.  Attempt count rides in the env."""
    attempt = int(os.environ.get("_BENCH_INIT_ATTEMPT", "0"))
    tries = int(os.environ.get("BENCH_INIT_TRIES", "5"))
    try:
        backend = jax.default_backend()
        jax.devices()
        return backend
    except RuntimeError as e:
        _beat(f"backend init failed (attempt {attempt + 1}/{tries}): {e}")
        if attempt + 1 >= tries:
            _fail_json(e)
            sys.exit(1)
        delay = min(10.0 * 2 ** attempt, 120.0)
        _beat(f"retrying in {delay:.0f}s")
        time.sleep(delay)
        os.environ["_BENCH_INIT_ATTEMPT"] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)


_backend = _init_backend_or_reexec()
_beat(f"jax imported, backend={_backend}")

import jax.numpy as jnp


def bench_bbc():
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
    # secondary kernel metric (BASELINE.json): one contact-LCP block is
    # solved per env per physics substep (decimation 4 per control step)
    solves_per_sec = env_steps_per_sec * cfg.control.decimation
    _beat(f"measured {dt * 1e3:.1f} ms/iter")
    sys.stderr.write(f"contact_qp_solves_per_sec: {solves_per_sec:,.0f}\n")
    print(json.dumps({
        "metric": "env_steps_per_sec",
        "value": round(env_steps_per_sec, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(env_steps_per_sec / 57000.0, 3),
    }), flush=True)


def bench_tsc():
    """TSC teacher full hierarchical iteration: TSC policy -> set_commands ->
    frozen BBC -> obstacle-course env (SoA engine + Pallas band windows) ->
    frozen-disc reward -> hybrid PPO update (tools/bench_tsc.py, promoted to
    the driver scoreboard per VERDICT r3 item 2)."""
    import dataclasses

    from agility_tpu.learn.jitwrap import jit_with_world
    from agility_tpu.envs.go2_agility import Go2AgilityEnv
    from agility_tpu.envs.tsc_config import Go2AgilityCfg
    from agility_tpu.learn.ppo_tsc import TscAlgoCfg, TscPPO
    from agility_tpu.learn.runner_tsc import load_bbc_frozen

    N = int(os.environ.get("BENCH_TSC_ENVS", "6144"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))

    cfg = Go2AgilityCfg()
    cfg = dataclasses.replace(cfg, env=dataclasses.replace(cfg.env, num_envs=N))
    env = Go2AgilityEnv(cfg)
    bbc = load_bbc_frozen(None, seed=0)
    alg = TscPPO(env, bbc, TscAlgoCfg())
    _beat("tsc env+alg built")
    ts = jax.jit(alg.init_train_state)(jax.random.PRNGKey(0))
    es = jit_with_world(env.init_state, env)(jax.random.PRNGKey(1))
    dh = jnp.repeat(es.disc_obs[:, None], 2, axis=1)
    jax.block_until_ready(es.sim.base_pos)
    _beat("tsc states initialized; compiling train_iteration")

    it_fn = jit_with_world(alg.train_iteration, env)
    t0 = time.time()
    ts, es, dh, m = it_fn(ts, es, dh, jnp.asarray(1))
    jax.block_until_ready(m)
    _beat(f"tsc compile+first iter done ({time.time() - t0:.1f}s); "
          f"measuring {iters} iters")

    t0 = time.time()
    for i in range(iters):
        ts, es, dh, m = it_fn(ts, es, dh, jnp.asarray(i + 2))
    jax.block_until_ready(m)
    dt = (time.time() - t0) / iters
    steps_per_iter = alg.cfg.num_steps_per_env * N
    _beat(f"tsc measured {dt * 1e3:.1f} ms/iter")
    print(json.dumps({
        "metric": "tsc_env_steps_per_sec",
        "value": round(steps_per_iter / dt, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_iter / dt / 61000.0, 3),
    }), flush=True)


def main():
    bench_bbc()
    if os.environ.get("BENCH_TSC", "1") == "1":
        bench_tsc()


if __name__ == "__main__":
    main()
