import os, sys, time, dataclasses
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from agility_tpu.envs.go2_agility import Go2AgilityEnv
from agility_tpu.envs.tsc_config import Go2AgilityCfg
from agility_tpu.learn.ppo_tsc import TscAlgoCfg, TscPPO
from agility_tpu.learn.runner_tsc import load_bbc_frozen

N = int(os.environ.get("N", "6144"))
cfg = Go2AgilityCfg()
cfg = dataclasses.replace(cfg, env=dataclasses.replace(cfg.env, num_envs=N))
env = Go2AgilityEnv(cfg)
bbc = load_bbc_frozen(None, seed=0)
alg = TscPPO(env, bbc, TscAlgoCfg())
ts = jax.jit(alg.init_train_state)(jax.random.PRNGKey(0))
es = jax.jit(env.init_state)(jax.random.PRNGKey(1))
dh = jnp.repeat(es.disc_obs[:, None], 2, axis=1)
it_fn = jax.jit(alg.train_iteration)
t0 = time.time()
ts, es, dh, m = it_fn(ts, es, dh, jnp.asarray(1)); jax.block_until_ready(m)
print(f"compile+1st: {time.time()-t0:.1f}s", flush=True)
reps = 5
t0 = time.time()
for i in range(reps):
    ts, es, dh, m = it_fn(ts, es, dh, jnp.asarray(2 + i))
jax.block_until_ready(m)
dt = (time.time() - t0) / reps
steps = N * alg.cfg.num_steps_per_env
print(f"iter {dt*1e3:.1f} ms  ->  {steps/dt/1e3:.1f}k env-steps/s "
      f"(N={N}, T={alg.cfg.num_steps_per_env})", flush=True)
