"""Trajectory-level diagnosis of a trained BBC checkpoint (VERDICT r4 item 1).

Steps a trained policy in a chosen mode on the CPU backend (vmap engine
path — no chip contention) and prints per-step aggregates that separate the
three failure hypotheses for the 12.4 m/s "trot":

  * physics exploit (contact solver injects energy at speed): kinetic
    energy rises while feet are airborne-bouncing; |v| grows across hops.
  * falling-off-world artifact (harness measures through fall-to-z<-6
    resets): |v| ramps linearly at ~g between resets, z monotonically
    drops, episode ends by timeout/fall rather than contact.
  * measurement bug: sim velocities stay sane but the report is wrong.

Usage:
  python tools/diagnose_gait.py --checkpoint logs/bbc_r4/0/model_100000.msgpack \
      --mode trot --vx 1.0 --steps 300 --num_envs 8
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("AGILITY_ENGINE", "vmap")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--mode", default="trot")
    p.add_argument("--vx", type=float, default=1.0)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--num_envs", type=int, default=8)
    p.add_argument("--mocap_dir", default="/root/reference/bbc/mocap_data")
    p.add_argument("--dump", default=None)
    args = p.parse_args()

    from agility_tpu.cli import registry
    from agility_tpu.core import quat as qm
    from agility_tpu.envs.config import MOCAP_CATEGORIES
    from agility_tpu.envs.go2_locomotion import Go2LocomotionEnv
    from agility_tpu.learn.jitwrap import jit_with_world
    from agility_tpu.learn.runner import OnPolicyRunner

    make_env_cfg, make_algo_cfg = registry.get("go2_locomotion")
    cfg = make_env_cfg()
    cfg = registry.apply_overrides(
        cfg,
        **{"env.num_envs": args.num_envs,
           "env.mocap_category": (args.mode,),
           "mocap_dir": args.mocap_dir,
           "noise.add_noise": False,
           "domain_rand.push_robots": False,
           "domain_rand.randomize_friction": False,
           "domain_rand.randomize_base_mass": False,
           "domain_rand.randomize_base_com": False,
           "domain_rand.randomize_motor": False,
           "domain_rand.action_delay": False})
    env = Go2LocomotionEnv(cfg)
    runner = OnPolicyRunner(env, make_algo_cfg(), log_dir=None, seed=0)
    runner.load(args.checkpoint)
    policy = runner.get_inference_policy()
    step = jit_with_world(env.step, env)
    state = runner.env_state

    mode_idx = MOCAP_CATEGORIES.index(args.mode)
    N = args.num_envs
    cmd = jnp.tile(jnp.asarray([args.vx, 0.0, 0.0, 0.0, 0.30]), (N, 1))
    c = jax.nn.one_hot(jnp.full((N,), mode_idx), len(MOCAP_CATEGORIES))

    # mass for kinetic-energy estimate (base translation only — enough for
    # the exploit-vs-fall signature)
    m_tot = float(np.sum(np.asarray(env.mc.link_mass)))

    rows = []
    traj = {k: [] for k in ("z", "vx_w", "vz_w", "speed", "contact", "reset",
                            "vx_local", "dof_vel_max", "tau_max")}
    for t in range(args.steps):
        state = state._replace(commands=cmd, latent_c=c)
        acts = policy(state.obs_buf)
        state, out = step(state, acts)
        sim = state.sim
        v = np.asarray(sim.u[:, :3])
        bq = sim.base_quat
        v_local = np.asarray(qm.quat_rotate_inverse(bq, sim.u[:, :3]))
        speed = np.linalg.norm(v, axis=-1)
        traj["z"].append(np.asarray(sim.base_pos[:, 2]))
        traj["vx_w"].append(v[:, 0])
        traj["vz_w"].append(v[:, 2])
        traj["speed"].append(speed)
        traj["vx_local"].append(v_local[:, 0])
        traj["contact"].append(np.asarray(state.contact_filt).sum(-1))
        traj["reset"].append(np.asarray(out.reset))
        traj["dof_vel_max"].append(np.abs(np.asarray(sim.u[:, 6:])).max(-1))
        traj["tau_max"].append(np.abs(np.asarray(state.torques_org)).max(-1))

    for k in traj:
        traj[k] = np.stack(traj[k])          # (T, N)

    T = args.steps
    resets = traj["reset"].sum(axis=0)
    print(f"mode={args.mode} cmd vx={args.vx} N={N} T={T}  total_mass={m_tot:.2f} kg")
    print(f"resets/env over rollout: {resets}")
    print(f"|vx_local - cmd| mean {np.abs(traj['vx_local'] - args.vx).mean():.3f}")
    print(f"speed: mean {traj['speed'].mean():.2f}  max {traj['speed'].max():.2f} m/s")
    print(f"z:     mean {traj['z'].mean():.2f}  min {traj['z'].min():.2f}  "
          f"max {traj['z'].max():.2f} m")
    print(f"contact count mean {traj['contact'].mean():.2f} / 4")
    print(f"dof_vel max {traj['dof_vel_max'].max():.1f} rad/s  "
          f"tau max {traj['tau_max'].max():.1f} Nm")

    # per-env worst-window report: where does speed peak, and what does z do
    # around it?
    for n in range(min(N, 4)):
        t_pk = int(traj["speed"][:, n].argmax())
        lo, hi = max(0, t_pk - 5), min(T, t_pk + 5)
        print(f"\nenv {n}: peak speed {traj['speed'][t_pk, n]:.2f} m/s at t={t_pk}")
        for t in range(lo, hi):
            print(f"  t={t:4d} z={traj['z'][t, n]:+7.2f} vz={traj['vz_w'][t, n]:+7.2f} "
                  f"vx={traj['vx_w'][t, n]:+7.2f} |v|={traj['speed'][t, n]:6.2f} "
                  f"nc={int(traj['contact'][t, n])} reset={int(traj['reset'][t, n])}")

    if args.dump:
        np.savez(args.dump, **traj)
        print(f"\ntrajectory written to {args.dump}")


if __name__ == "__main__":
    main()
