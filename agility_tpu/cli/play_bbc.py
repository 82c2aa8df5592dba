"""BBC evaluation entry point (reference bbc/legged_gym/scripts/play.py).

Headless: rolls the trained policy for a fixed horizon with chosen behavior
mode and commands, prints gait/tracking statistics, and optionally dumps the
state trajectory to .npz (the reference's interactive viewer is replaced by
a trajectory dumper, SURVEY.md §2.0).
"""
from __future__ import annotations

import argparse
import os


def get_args():
    p = argparse.ArgumentParser(description="Evaluate a trained BBC policy")
    p.add_argument("--task", default="go2_locomotion")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--log_root", default="logs")
    p.add_argument("--experiment_idx", type=int, default=0)
    p.add_argument("--num_envs", type=int, default=16)
    p.add_argument("--steps", type=int, default=500)
    p.add_argument("--mode", default="trot",
                   choices=["walk", "pace", "trot", "canter", "jump"])
    p.add_argument("--vx", type=float, default=1.0)
    p.add_argument("--vy", type=float, default=0.0)
    p.add_argument("--wz", type=float, default=0.0)
    p.add_argument("--mocap_dir", default=None)
    p.add_argument("--dump", default=None, help="write trajectory .npz here")
    p.add_argument("--compare_gait", action="store_true",
                   help="check rollout gait statistics against per-mode "
                        "bands derived from the mocap clips (behavior-parity "
                        "harness, io/gait.py); exits 1 on failure")
    p.add_argument("--gait_bands", default=None,
                   help="path to a bands artifact (tools/make_gait_bands.py; "
                        "the committed real-clip bands live at "
                        "agility_tpu/assets/gait_bands_real.json); implies "
                        "--compare_gait and replaces the live-derived bands")
    p.add_argument("--interactive", action="store_true",
                   help="curses keyboard play: live telemetry panel, "
                        "W/S/A/D velocity, 1-5 mode, height keys "
                        "(reference base_task.py:71-236 viewer bindings)")
    return p.parse_args()


def main():
    from agility_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    args = get_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from agility_tpu.learn.jitwrap import jit_with_world
    from agility_tpu.cli import registry
    from agility_tpu.envs.config import MOCAP_CATEGORIES
    from agility_tpu.envs.go2_locomotion import Go2LocomotionEnv
    from agility_tpu.io import checkpoint as ckpt
    from agility_tpu.learn.runner import OnPolicyRunner

    make_env_cfg, make_algo_cfg = registry.get(args.task)
    cfg = make_env_cfg()
    # play-time overrides (reference play.py:20-38: small batch, fixed mode,
    # domain randomization off); interactive keeps all modes switchable
    mocap_cat = (cfg.env.mocap_category if args.interactive
                 else (args.mode,))
    cfg = registry.apply_overrides(
        cfg,
        **{"env.num_envs": args.num_envs,
           "env.mocap_category": mocap_cat,
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

    path = args.checkpoint or ckpt.latest(
        os.path.join(args.log_root, args.task, str(args.experiment_idx)))
    if path:
        print(f"loading {path}")
        runner.load(path)
    else:
        print("WARNING: no checkpoint found — evaluating an untrained policy")

    policy = runner.get_inference_policy()
    step = jit_with_world(env.step, env)
    state = runner.env_state
    mode_idx = MOCAP_CATEGORIES.index(args.mode)
    if args.interactive:
        from agility_tpu.cli import interactive

        interactive.run(env, policy, state, mode_idx=mode_idx,
                        vx=args.vx, vy=args.vy, wz=args.wz)
        return
    cmd = jnp.tile(jnp.asarray([args.vx, args.vy, args.wz, 0.0, 0.30]),
                   (args.num_envs, 1))
    c = jax.nn.one_hot(jnp.full((args.num_envs,), mode_idx), len(MOCAP_CATEGORIES))

    traj = {"base_pos": [], "base_vel": [], "dof_pos": [], "contact": []}
    track_err = []
    for _ in range(args.steps):
        state = state._replace(commands=cmd, latent_c=c)
        acts = policy(state.obs_buf)
        state, out = step(state, acts)
        bq = state.sim.base_quat
        from agility_tpu.core import quat as qm
        v_local = qm.quat_rotate_inverse(bq, state.sim.u[:, :3])
        track_err.append(np.asarray(jnp.abs(v_local[:, 0] - args.vx)))
        traj["base_pos"].append(np.asarray(state.sim.base_pos))
        traj["base_vel"].append(np.asarray(v_local))
        traj["dof_pos"].append(np.asarray(state.sim.dof_pos))
        traj["contact"].append(np.asarray(state.contact_filt))

    track_err = np.stack(track_err)
    contact = np.stack(traj["contact"])
    print(f"mode={args.mode} cmd vx={args.vx}: "
          f"|vx err| mean {track_err.mean():.3f} (last-100 {track_err[-100:].mean():.3f})")
    duty = contact.mean(axis=(0, 1))
    print(f"duty factors FL/FR/RL/RR: {np.array2string(duty, precision=2)}")
    if args.dump:
        np.savez(args.dump, **{k: np.stack(v) for k, v in traj.items()})
        print(f"trajectory written to {args.dump}")
    if args.compare_gait or args.gait_bands:
        import json

        from agility_tpu.io import gait

        # skip the transient: settle into the gait before measuring
        stats = gait.gait_stats(contact[100:] if len(contact) > 200 else contact,
                                env.dt)
        if args.gait_bands:
            with open(args.gait_bands) as f:
                stored = json.load(f)[args.mode]
            bands = {k: tuple(v) for k, v in stored.items() if k != "clips"}
        else:
            bands = gait.bands_from_motion(env.motion, mode_idx)
        if not bands:
            print(f"no mocap clips for mode {args.mode}; cannot compare")
            raise SystemExit(2)
        verdict = gait.compare(stats, bands)
        print(gait.format_report(stats, bands, verdict))
        if not verdict["ok"]:
            raise SystemExit(1)


if __name__ == "__main__":
    main()
