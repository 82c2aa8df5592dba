"""Substep-internal ablation: where does the SoA physics substep spend time?

Builds partial substeps from soa.py's pieces — FK/geometry, free dynamics
(CRBA factors + bias + solve), contact detection sampling, Delassus diag
inverse, projected-Jacobi sweeps — each integrated and fed back through a
lax.scan so nothing is hoisted or DCE'd (PERF_NOTES.md measurement rules).
Differences between consecutive rows attribute the cost.

  BENCH_ENVS=6144 python tools/bench_substep.py
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
from agility_tpu.physics import heightfield as hf
from agility_tpu.physics import patch as pt
from agility_tpu.physics import soa
from agility_tpu.physics.constants import ModelConsts

DT = 0.005


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
    print(f"{label:<34} {dt * 1e3:9.2f} ms   (compile {compile_s:.0f}s)",
          flush=True)
    return dt


def main():
    N = int(os.environ.get("BENCH_ENVS", "6144"))
    T = int(os.environ.get("BENCH_STEPS", "50"))

    mc = ModelConsts.from_model(build_go2_model())
    c = soa.consts_of(mc)
    rng = np.random.default_rng(0)
    hmap = (0.06 * rng.normal(size=(600, 600))).astype(np.float32)
    grid = hf.from_numpy(hmap, 0.05, origin_xy=(-15.0, -15.0))

    bp = jnp.asarray(np.concatenate(
        [rng.uniform(-10, 10, (2, N)), np.full((1, N), 0.34)], 0), jnp.float32)
    bq = jnp.tile(jnp.array([[0.0], [0.0], [0.0], [1.0]], jnp.float32), (1, N))
    q = jnp.tile(mc.default_dof_pos[:, None], (1, N))
    u = jnp.zeros((18, N), jnp.float32)
    sd0 = soa.SoAState(bp=bp, bq=bq, q=q, u=u)
    target = jnp.tile(mc.default_dof_pos[:, None], (1, N))
    kp = jnp.full((12, N), 40.0)
    kd = jnp.full((12, N), 1.0)
    prm = dict(kp_scale=jnp.ones((12, N)), kd_scale=jnp.ones((12, N)),
               friction=jnp.ones(N))

    # patch sampler, extracted once outside the scan (the control-step cost
    # attribution for extraction lives in bench_stages_tsc / PERF_NOTES)
    tpatch = pt.extract_batch(
        hf.HeightGrid(height=grid.height, hscale=grid.hscale,
                      origin=grid.origin),
        jnp.transpose(bp[:2]), 32, None)
    vals_T = jnp.transpose(tpatch.values, (1, 2, 0))
    sampler = lambda x, y: soa.patch_sample_hn(
        vals_T, tpatch.x0, tpatch.y0, grid.origin, grid.hscale, x, y)

    gravity = (0.0, 0.0, -9.81)

    def integrate(sd, u_new):
        u_arr = jnp.stack(u_new) if isinstance(u_new, list) else u_new
        bp2 = sd.bp + DT * u_arr[0:3]
        bq2 = jnp.stack(soa.q_integrate(
            (sd.bq[0], sd.bq[1], sd.bq[2], sd.bq[3]),
            (u_arr[3], u_arr[4], u_arr[5]), DT))
        return soa.SoAState(bp=bp2, bq=bq2, q=sd.q + DT * u_arr[6:],
                            u=u_arr)

    def fk_only(sd):
        ls = soa.fk_vel(c, (sd.bp[0], sd.bp[1], sd.bp[2]),
                        (sd.bq[0], sd.bq[1], sd.bq[2], sd.bq[3]), sd.q, sd.u)
        cen, lever = soa.sphere_geometry(c, ls)
        # fold everything into a fake velocity so nothing is DCE'd
        dv = 1e-9 * (cen[2] + lever[0, 0])              # (S, N)
        u_new = sd.u.at[2].add(jnp.sum(dv, 0) - 9.81 * DT)
        return integrate(sd, u_new)

    def free_dyn(sd):
        ls = soa.fk_vel(c, (sd.bp[0], sd.bp[1], sd.bp[2]),
                        (sd.bq[0], sd.bq[1], sd.bq[2], sd.bq[3]), sd.q, sd.u)
        com = soa.link_coms(c, ls)
        eff = jnp.asarray(c.effort, sd.q.dtype)[:, None]
        tau = jnp.clip(kp * (target - sd.q) - kd * sd.u[6:], -eff, eff)
        f = soa.mass_factors(c, ls, com)
        C = soa.bias_forces(c, ls, com, [sd.u[6 + d] for d in range(12)],
                            gravity)
        rhs = [-C[i] for i in range(6)] + [tau[d] - C[6 + d] for d in range(12)]
        du = soa.solve(f, rhs)
        u_free = [sd.u[i] + DT * du[i] for i in range(18)]
        cen, lever = soa.sphere_geometry(c, ls)
        u_new = [u_free[i] + 1e-12 * jnp.sum(lever[0, 0], 0) for i in range(18)]
        return integrate(sd, u_new)

    def mk_full(iters, with_delassus=True):
        def step(sd):
            ls = soa.fk_vel(c, (sd.bp[0], sd.bp[1], sd.bp[2]),
                            (sd.bq[0], sd.bq[1], sd.bq[2], sd.bq[3]),
                            sd.q, sd.u)
            com = soa.link_coms(c, ls)
            eff = jnp.asarray(c.effort, sd.q.dtype)[:, None]
            tau = jnp.clip(kp * (target - sd.q) - kd * sd.u[6:], -eff, eff)
            f = soa.mass_factors(c, ls, com)
            C = soa.bias_forces(c, ls, com,
                                [sd.u[6 + d] for d in range(12)], gravity)
            rhs = [-C[i] for i in range(6)] + [tau[d] - C[6 + d]
                                               for d in range(12)]
            du = soa.solve(f, rhs)
            u_free = [sd.u[i] + DT * du[i] for i in range(18)]
            cen, lever = soa.sphere_geometry(c, ls)
            h, n = sampler(cen[0], cen[1])
            radius = jnp.asarray(c.sph_radius, h.dtype)[:, None]
            phi = (cen[2] - h) * n[2] - radius
            r = (cen[0] - sd.bp[0][None], cen[1] - sd.bp[1][None],
                 cen[2] - sd.bp[2][None])
            if with_delassus:
                u_new, force, lam = soa.jacobi_solve(
                    phi, n, r, lever, f, u_free, prm["friction"], DT,
                    iters=iters, relax=0.7, baumgarte=0.2, slop=0.002,
                    max_depen_vel=1.0, restitution=0.0)
            else:
                pen = 1e-9 * jnp.sum(jnp.maximum(-phi, 0.0) * n[2], 0)
                u_new = [u_free[i] + pen for i in range(18)]
            return integrate(sd, u_new)
        return step

    def scanned(step):
        def fn(sd):
            def body(sd, _):
                sd2 = step(sd)
                # keep the base from walking off the patch
                sd2 = soa.SoAState(bp=sd2.bp.at[2].set(jnp.clip(sd2.bp[2], 0.1, 0.6)),
                                   bq=sd2.bq, q=sd2.q, u=sd2.u)
                return sd2, sd2.bp[2, 0]
            sd, z = jax.lax.scan(body, sd, None, length=T)
            return sd, z
        return jax.jit(fn)

    print(f"N={N}, T={T} substeps per scan", flush=True)
    t_fk = timed("fk + sphere geometry", scanned(fk_only), sd0) / T
    t_fd = timed("+ CRBA factors + bias + solve", scanned(free_dyn), sd0) / T
    t_det = timed("+ detection (no LCP)", scanned(mk_full(0, False)), sd0) / T
    t_d0 = timed("+ Delassus (0 sweeps)", scanned(mk_full(0)), sd0) / T
    t_s5 = timed("+ 5 Jacobi sweeps", scanned(mk_full(5)), sd0) / T
    t_s10 = timed("+ 10 Jacobi sweeps", scanned(mk_full(10)), sd0) / T

    print(f"\nper-substep attribution @N={N}:")
    print(f"  fk+geometry        {t_fk*1e3:7.3f} ms")
    print(f"  free dynamics      {(t_fd - t_fk)*1e3:7.3f} ms")
    print(f"  detection sampling {(t_det - t_fd)*1e3:7.3f} ms")
    print(f"  delassus build     {(t_d0 - t_det)*1e3:7.3f} ms")
    print(f"  5 sweeps           {(t_s5 - t_d0)*1e3:7.3f} ms")
    print(f"  sweep marginal     {(t_s10 - t_s5)*1e3/5:7.3f} ms/sweep")
    print(f"  full substep       {t_s5*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
