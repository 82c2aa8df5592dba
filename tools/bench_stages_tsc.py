"""Per-stage timing of the TSC teacher training iteration.

Attributes the full-iteration cost (tools/bench_tsc.py headline) to its
stages — rollout (TSC policy + set_commands + frozen BBC + env.step + disc
reward), PPO update, DAgger — plus env.step alone and the policy/bbc nets
alone, each measured inside a lax.scan with the evolving state as carry
(loop-invariant hoisting rules per PERF_NOTES.md).

  BENCH_ENVS=6144 python tools/bench_stages_tsc.py
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
    print(f"{label:<30} {dt * 1e3:9.1f} ms   (compile {compile_s:.0f}s)",
          flush=True)
    return dt


def main():
    from agility_tpu.envs.go2_agility import Go2AgilityEnv
    from agility_tpu.envs.tsc_config import Go2AgilityCfg
    from agility_tpu.learn import networks_tsc as tnets
    from agility_tpu.learn.jitwrap import jit_with_world
    from agility_tpu.learn.ppo_tsc import TscAlgoCfg, TscPPO
    from agility_tpu.learn.runner_tsc import load_bbc_frozen
    import dataclasses

    N = int(os.environ.get("BENCH_ENVS", "6144"))
    K = int(os.environ.get("BENCH_SCAN", "4"))

    cfg = Go2AgilityCfg()
    cfg = dataclasses.replace(cfg, env=dataclasses.replace(cfg.env, num_envs=N))
    env = Go2AgilityEnv(cfg)
    bbc = load_bbc_frozen(None, seed=0)
    alg = TscPPO(env, bbc, TscAlgoCfg())
    ts = jax.jit(alg.init_train_state)(jax.random.PRNGKey(0))
    es = jit_with_world(env.init_state, env)(jax.random.PRNGKey(1))
    dh = jnp.repeat(es.disc_obs[:, None], 2, axis=1)
    jax.block_until_ready(es.sim.base_pos)
    print(f"N={N} envs, scan reps={K}", flush=True)

    def full(ts, es, dh, grid=None):
        def body(c, _):
            ts, es, dh = c
            ts, es, dh, m = alg.train_iteration(ts, es, dh, jnp.asarray(1),
                                                grid=grid)
            return (ts, es, dh), m["rollout/r_total"]
        (ts, es, dh), r = jax.lax.scan(body, (ts, es, dh), None, length=K)
        return ts, es, dh, r

    t_full = timed("full train_iteration", jit_with_world(full, env),
                   ts, es, dh) / K

    def rollout_only(ts, es, dh, grid=None):
        def body(c, _):
            ts, es, dh = c
            ts, es, dh, trs, m = alg.rollout(ts, es, dh, jnp.asarray(True),
                                             grid)
            return (ts, es, dh), m["r_total"]
        (ts, es, dh), r = jax.lax.scan(body, (ts, es, dh), None, length=K)
        return ts, es, dh, r

    t_roll = timed("rollout (24 steps)", jit_with_world(rollout_only, env),
                   ts, es, dh) / K

    # env.step alone (zero TSC/BBC nets): PD-stand actions
    def env_only(es, grid=None):
        a = jnp.zeros((N, 12), jnp.float32)
        def body(es, _):
            es, out = env.step(es, a, grid=grid)
            return es, out.rew
        es, r = jax.lax.scan(body, es, None, length=24)
        return es, r

    t_env = timed("env.step x24 (no nets)", jit_with_world(env_only, env),
                  es) / 1

    # nets alone: estimator + TSC heads(2x) + value + set_commands + BBC act,
    # feeding the action back into set_commands so nothing is hoisted
    def nets_only(ts, es, grid=None):
        s = alg.slices
        def body(c, _):
            es, obs = c
            est = alg.estimator.apply(ts.est_params, obs[:, :57])
            obs_est = obs.at[:, s.explicit].set(est)
            ld_h, mc_h, std = alg.ac.apply(ts.ac_params, obs_est,
                                           method="heads", hist_encoding=True)
            ld_p, mc_p, _ = alg.ac.apply(ts.ac_params, obs_est,
                                         method="heads", hist_encoding=False)
            logits_d = jnp.where(True, ld_h, ld_p)
            mean_c = jnp.where(True, mc_h, mc_p)
            a = tnets.hybrid_sample(jax.random.PRNGKey(0), logits_d, mean_c,
                                    std)
            values = alg.ac.apply(ts.ac_params, obs, method="value")
            es2, next_commands = env.set_commands(es, a)
            actions_bbc = alg.bbc_act(es.obs_bbc_buf, next_commands)
            obs2 = obs + 1e-6 * jnp.sum(actions_bbc) + 1e-6 * values[:, None]
            return (es2, obs2), jnp.mean(actions_bbc)
        (es, _), r = jax.lax.scan(body, (es, es.obs_buf), None, length=24)
        return r

    t_nets = timed("nets x24 (policy+bbc+cmds)", jit_with_world(nets_only, env),
                   ts, es) / 1

    # materialize one rollout for the update stages
    ts2, es2, dh2, trs, _ = jit_with_world(
        lambda ts, es, dh, grid=None: alg.rollout(
            ts, es, dh, jnp.asarray(True), grid), env)(ts, es, dh)
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

    t_ppo = timed("ppo_update", ppo_only, ts2, trs, advantages, returns) / K

    @jax.jit
    def dagger_only(ts, trs):
        def body(ts, k):
            ts, m = alg.dagger_update(ts, trs, k)
            return ts, jax.tree.leaves(m)[0]
        ks = jax.random.split(jax.random.PRNGKey(3), K)
        ts, v = jax.lax.scan(body, ts, ks)
        return ts, v

    t_dag = timed("dagger_update", dagger_only, ts2, trs) / K

    print(f"\nfull {t_full*1e3:.1f} ms = rollout {t_roll*1e3:.1f} "
          f"(env {t_env*1e3:.1f} + nets {t_nets*1e3:.1f} + rest "
          f"{(t_roll-t_env-t_nets)*1e3:.1f}) + ppo {t_ppo*1e3:.1f} "
          f"+ dagger/{20} {t_dag*1e3/20:.1f}")
    print(f"env-steps/s (full): {24 * N / t_full:,.0f}")


if __name__ == "__main__":
    main()
