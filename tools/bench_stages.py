"""Per-stage timing of the BBC training iteration on the ambient accelerator.

Attributes the full-iteration cost (bench.py headline) to its stages —
rollout (physics + obs + policy + disc reward), PPO update, discriminator
update, DAgger — each measured inside a lax.scan with the evolving train
state as carry (loop-invariant hoisting rules per PERF_NOTES.md; the
rollout data for update stages is invariant, but every update consumes the
changing params so the work cannot be DCE'd).

  BENCH_ENVS=4096 python tools/bench_stages.py
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
from agility_tpu.learn.ssinfogail import AlgoCfg, SSInfoGAIL


def timed(label, fn, *args, reps=3):
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    dt = (time.time() - t0) / reps
    print(f"{label:<28} {dt * 1e3:9.1f} ms   (compile {compile_s:.0f}s)",
          flush=True)
    return dt


def main():
    N = int(os.environ.get("BENCH_ENVS", "4096"))
    K = int(os.environ.get("BENCH_SCAN", "4"))   # reps inside each scan

    cfg = Go2LocomotionCfg(
        env=EnvCfg(num_envs=N),
        terrain=TerrainCfg(num_rows=4, num_cols=4, border_size=10.0))
    env = Go2LocomotionEnv(cfg)
    alg = SSInfoGAIL(env, AlgoCfg(num_preload_transitions=4096,
                                  disc_replay_buffer_size=(500_000 // N) * N),
                     seed=0)
    ts = jax.jit(alg.init_train_state)(jax.random.PRNGKey(0))
    es = jax.jit(env.init_state)(jax.random.PRNGKey(1))
    dh = jnp.repeat(es.disc_obs[:, None], cfg.env.disc_obs_len, axis=1)
    jax.block_until_ready(es.sim.base_pos)
    print(f"N={N} envs, scan reps={K}", flush=True)

    # one full iteration for reference + to materialize a rollout
    @jax.jit
    def full(ts, es, dh):
        def body(c, _):
            ts, es, dh = c
            ts, es, dh, m = alg.train_iteration(ts, es, dh, jnp.asarray(1))
            return (ts, es, dh), m["rollout/r_total"]
        (ts, es, dh), r = jax.lax.scan(body, (ts, es, dh), None, length=K)
        return ts, es, dh, r

    t_full = timed("full train_iteration", full, ts, es, dh) / K

    @jax.jit
    def rollout_only(ts, es, dh):
        def body(c, _):
            ts, es, dh = c
            ts, es, dh, trs, m = alg.rollout(ts, es, dh, jnp.asarray(True))
            return (ts, es, dh), m["r_total"]
        (ts, es, dh), r = jax.lax.scan(body, (ts, es, dh), None, length=K)
        return ts, es, dh, r

    t_roll = timed("rollout (24 steps)", rollout_only, ts, es, dh) / K

    # materialize one rollout's data for the update stages
    ts2, es2, dh2, trs, _ = jax.jit(
        lambda ts, es, dh: alg.rollout(ts, es, dh, jnp.asarray(True)))(ts, es, dh)
    last_values = alg.ac.apply(ts2.ac_params, es2.obs_buf, method="value")
    advantages, returns = alg.compute_gae(trs, last_values)
    jax.block_until_ready(advantages)

    @jax.jit
    def ppo_only(ts, trs, advantages, returns):
        def body(ts, k):
            ts, m = alg.ppo_update(ts, trs, advantages, returns, k)
            return ts, m["ppo/value"]
        ks = jax.random.split(jax.random.PRNGKey(2), K)
        ts, v = jax.lax.scan(body, ts, ks)
        return ts, v

    t_ppo = timed("ppo_update (5ep x 4mb)", ppo_only, ts2, trs,
                  advantages, returns) / K

    @jax.jit
    def disc_only(ts):
        def body(ts, k):
            ts, m = alg.disc_update(ts, k)
            return ts, m["disc/disc"]
        ks = jax.random.split(jax.random.PRNGKey(3), K)
        ts, v = jax.lax.scan(body, ts, ks)
        return ts, v

    t_disc = timed("disc_update (80 mb)", disc_only, ts2) / K

    @jax.jit
    def dagger_only(ts, trs):
        def body(ts, k):
            ts, m = alg.dagger_update(ts, trs, k)
            return ts, m["dagger/hist_latent"]
        ks = jax.random.split(jax.random.PRNGKey(4), K)
        ts, v = jax.lax.scan(body, ts, ks)
        return ts, v

    t_dag = timed("dagger_update", dagger_only, ts2, trs) / K

    steps = alg.cfg.num_steps_per_env * N
    print(f"\nfull iteration: {t_full * 1e3:.1f} ms "
          f"-> {steps / t_full:,.0f} env-steps/s")
    print(f"  rollout {t_roll * 1e3:8.1f} ms ({t_roll / t_full * 100:4.1f}%)"
          f"  [{t_roll / alg.cfg.num_steps_per_env * 1e3:.2f} ms/env-step]")
    print(f"  ppo     {t_ppo * 1e3:8.1f} ms ({t_ppo / t_full * 100:4.1f}%)")
    print(f"  disc    {t_disc * 1e3:8.1f} ms ({t_disc / t_full * 100:4.1f}%)")
    print(f"  dagger  {t_dag * 1e3:8.1f} ms ({t_dag / t_full * 100:4.1f}%)"
          f"  (every {alg.cfg.dagger_update_freq} iters)")
    print(f"  residual {(t_full - t_roll - t_ppo - t_disc) * 1e3:.1f} ms "
          f"(GAE, task-weight, metrics; dagger amortized)")


if __name__ == "__main__":
    main()
