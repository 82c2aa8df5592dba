"""Physics-engine throughput: SoA (env-minor) vs vmapped path.

Measures pure control-step throughput at BENCH_ENVS envs on rough terrain
with the full state fed back through a lax.scan (loop-invariant hoisting and
DCE make anything less a fiction — PERF_NOTES.md).

  python tools/bench_engine.py            # both paths
  BENCH_PATHS=soa python tools/bench_engine.py
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
import numpy as np

from agility_tpu.core.urdf import build_go2_model
from agility_tpu.physics import engine as eng
from agility_tpu.physics import heightfield as hf
from agility_tpu.physics.constants import ModelConsts


def main():
    N = int(os.environ.get("BENCH_ENVS", "4096"))
    T = int(os.environ.get("BENCH_STEPS", "50"))
    paths = os.environ.get("BENCH_PATHS", "soa,vmap").split(",")

    mc = ModelConsts.from_model(build_go2_model())
    rng = np.random.default_rng(0)
    hmap = (0.06 * rng.normal(size=(600, 600))).astype(np.float32)
    grid = hf.from_numpy(hmap, 0.05, origin_xy=(-15.0, -15.0))

    s = eng.EnvState(
        base_pos=jnp.asarray(
            np.concatenate([rng.uniform(-10, 10, (N, 2)),
                            np.full((N, 1), 0.45)], -1), jnp.float32),
        base_quat=jnp.tile(jnp.array([0, 0, 0, 1.0], jnp.float32), (N, 1)),
        dof_pos=jnp.tile(mc.default_dof_pos, (N, 1)),
        u=jnp.zeros((N, 18), jnp.float32))
    control = eng.Control(target=jnp.tile(mc.default_dof_pos, (N, 1)),
                          kp=jnp.full((N, 12), 40.0), kd=jnp.full((N, 12), 1.0))
    params = eng.EnvParams(
        friction=jnp.asarray(rng.uniform(0.5, 1.25, N), jnp.float32),
        kp_scale=jnp.asarray(rng.uniform(0.9, 1.1, (N, 12)), jnp.float32),
        kd_scale=jnp.asarray(rng.uniform(0.9, 1.1, (N, 12)), jnp.float32),
        added_base_mass=jnp.asarray(rng.uniform(0, 1.5, N), jnp.float32),
        base_com_shift=jnp.asarray(rng.uniform(-0.05, 0.05, (N, 3)), jnp.float32),
    )

    for name in paths:
        cfg = eng.EngineConfig(
            soa=(name == "soa"),
            jacobi_iters=int(os.environ.get("BENCH_LCP_ITERS", "10")))

        def roll(s0):
            def body(st, _):
                st2, taus, bf, _, _ = eng.step_batch(mc, cfg, grid, st, control, params)
                # feed everything back so nothing is DCE'd/hoisted
                st2 = st2._replace(u=st2.u + 1e-12 * bf[:, 0] .sum(-1)[:, None])
                return st2, (jnp.sum(taus[0][:, 0]), jnp.sum(bf[:, :, 2]))
            return jax.lax.scan(body, s0, None, length=T)

        f = jax.jit(roll)
        t0 = time.time()
        out = f(s)
        jax.block_until_ready(out[1])
        print(f"[{name}] compile+first: {time.time() - t0:.1f}s", file=sys.stderr)
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = f(s)
        jax.block_until_ready(out[1])
        dt = (time.time() - t0) / reps
        sps = N * T / dt
        print(f"[{name}] {dt / T * 1e3:.2f} ms/control-step batch @ {N} envs "
              f"-> {sps:,.0f} env-steps/s (physics only)")


if __name__ == "__main__":
    main()
