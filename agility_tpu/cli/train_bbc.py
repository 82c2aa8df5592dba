"""BBC training entry point (reference bbc/legged_gym/scripts/train.py).

Usage:
  python -m agility_tpu.cli.train_bbc --task go2_locomotion --num_envs 4096 \
      --max_iterations 200000 --experiment_idx 0 [--resume] [--mocap_dir D]
"""
from __future__ import annotations

import argparse
import os


def get_args():
    p = argparse.ArgumentParser(description="Train the BBC (go2_locomotion) policy")
    p.add_argument("--task", default="go2_locomotion")
    p.add_argument("--num_envs", type=int, default=None)
    p.add_argument("--max_iterations", type=int, default=1500)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--experiment_idx", type=int, default=0)
    p.add_argument("--experiment_name", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--checkpoint", default=None, help="explicit checkpoint path")
    p.add_argument("--mocap_dir", default=None,
                   help="mocap dataset root (contains mocap_all_lb/ and "
                        "mocap_all_ulb/); synthetic gaits if omitted")
    p.add_argument("--log_root", default="logs")
    p.add_argument("--log_every", type=int, default=10)
    # distributed launch (SURVEY §5 distributed backend; the reference has
    # none — its --horovod flag is dead code)
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() (run one process "
                        "per host on a pod slice); implies --shard")
    p.add_argument("--shard", action="store_true",
                   help="shard envs over all visible devices on an "
                        "('env',) mesh (replicated params, DP)")
    # domain-randomization switches (reference flag vocabulary,
    # bbc/legged_gym/utils/helpers.py:171-230)
    for flag in ("push_robots", "randomize_friction", "randomize_base_mass",
                 "randomize_base_com", "randomize_motor", "action_delay"):
        p.add_argument(f"--no_{flag}", action="store_true",
                       help=f"disable domain_rand.{flag}")
    p.add_argument("--override", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="dotted config override, e.g. "
                        "normalization.task_obs_weight_decay_steps=12000 "
                        "(repeatable; values parsed as python literals)")
    return p.parse_args()


def main():
    from agility_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    args = get_args()

    if args.multihost:
        import jax

        jax.distributed.initialize()
        print(f"multihost: process {jax.process_index()}/{jax.process_count()}"
              f", {jax.device_count()} devices")

    from agility_tpu.cli import registry
    from agility_tpu.envs.go2_locomotion import Go2LocomotionEnv
    from agility_tpu.io import checkpoint as ckpt
    from agility_tpu.learn.runner import OnPolicyRunner

    make_env_cfg, make_algo_cfg = registry.get(args.task)
    cfg = make_env_cfg()
    overrides = {"env.num_envs": args.num_envs, "seed": args.seed,
                 "mocap_dir": args.mocap_dir}
    for flag in ("push_robots", "randomize_friction", "randomize_base_mass",
                 "randomize_base_com", "randomize_motor", "action_delay"):
        if getattr(args, f"no_{flag}"):
            overrides[f"domain_rand.{flag}"] = False
    import ast

    for ov in args.override:
        k, _, v = ov.partition("=")
        try:
            overrides[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            overrides[k] = v
    cfg = registry.apply_overrides(cfg, **overrides)

    exp_name = args.experiment_name or args.task
    log_dir = os.path.join(args.log_root, exp_name, str(args.experiment_idx))

    mesh = None
    if args.shard or args.multihost:
        from agility_tpu.dist import mesh as dist_mesh

        mesh = dist_mesh.make_mesh()
        print(f"env-sharded over {mesh.devices.size} devices")

    env = Go2LocomotionEnv(cfg)
    runner = OnPolicyRunner(env, make_algo_cfg(), log_dir=log_dir,
                            seed=args.seed, mesh=mesh)

    if args.resume or args.checkpoint:
        path = args.checkpoint or ckpt.latest(log_dir)
        if path:
            print(f"resuming from {path}")
            runner.load(path)
        elif args.resume:
            print("no checkpoint found; starting fresh")

    runner.learn(args.max_iterations, init_at_random_ep_len=True,
                 log_every=args.log_every)
    runner.save(runner.current_iteration)


if __name__ == "__main__":
    main()
