"""TSC training entry point (reference tsc/legged_gym/scripts/train.py).

Teacher phase:
  python -m agility_tpu.cli.train_tsc --proj_name agility --exptid 000 \
      --bbc_path logs/go2_locomotion/0/model.msgpack --max_iterations 30000
Student phase (depth distillation):
  python -m agility_tpu.cli.train_tsc --use_camera --resumeid 000 ...
"""
from __future__ import annotations

import argparse
import os


def get_args():
    p = argparse.ArgumentParser(description="Train the TSC agility policy")
    p.add_argument("--proj_name", default="agility")
    p.add_argument("--exptid", default="000")
    p.add_argument("--resumeid", default=None)
    p.add_argument("--num_envs", type=int, default=None)
    p.add_argument("--courses", type=int, default=None)
    p.add_argument("--max_iterations", type=int, default=30000)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--bbc_path", default=None,
                   help="BBC checkpoint for the frozen low-level policy")
    p.add_argument("--use_camera", action="store_true",
                   help="student phase: depth-camera distillation")
    p.add_argument("--obstacle_curriculum", action="store_true")
    # reference teacher-training flags (README.md:57: --randomize_start
    # --randomize_base_mass --randomize_base_com --push_robots)
    p.add_argument("--randomize_start", action="store_true",
                   help="spawn reset envs at a random station's approach "
                        "goal (reference obstacle.randomize_start)")
    p.add_argument("--randomize_base_mass", action="store_true")
    p.add_argument("--randomize_base_com", action="store_true")
    p.add_argument("--push_robots", action="store_true")
    p.add_argument("--reset_std", type=float, default=None,
                   help="on resume, reset the continuous-head std to this "
                        "value (reference reset_std / "
                        "policy.continue_from_last_std=False, "
                        "tsc task_registry.py:128-132)")
    p.add_argument("--log_root", default="logs")
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--debug", action="store_true", help="64 envs, tiny world")
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() (one process per "
                        "host on a pod slice); implies --shard")
    p.add_argument("--shard", action="store_true",
                   help="shard envs over all visible devices ('env' mesh)")
    return p.parse_args()


def main():
    import dataclasses

    import jax

    from agility_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    args_pre = get_args()
    if args_pre.multihost:
        jax.distributed.initialize()
        print(f"multihost: process {jax.process_index()}/{jax.process_count()}"
              f", {jax.device_count()} devices")

    from agility_tpu.learn.jitwrap import jit_with_world
    from agility_tpu.envs.go2_agility import Go2AgilityEnv
    from agility_tpu.envs.tsc_config import Go2AgilityCfg, tsc_smoke_cfg
    from agility_tpu.io import checkpoint as ckpt
    from agility_tpu.learn.ppo_tsc import TscAlgoCfg, TscPPO
    from agility_tpu.learn.runner_tsc import TscOnPolicyRunner, load_bbc_frozen
    from agility_tpu.learn.vision_tsc import TscVision, VisionCfg

    args = args_pre
    if args.debug:
        cfg = tsc_smoke_cfg(num_envs=64, courses=8)
    else:
        cfg = Go2AgilityCfg(seed=args.seed)
    if args.num_envs:
        cfg = dataclasses.replace(
            cfg, env=dataclasses.replace(cfg.env, num_envs=args.num_envs))
    elif args.use_camera and not args.debug:
        # depth-student training runs at the reference's camera env count
        # (legged_robot_config.py:65: camera_num_envs=256, applied by
        # helpers.py:117 when use_camera is set)
        cfg = dataclasses.replace(
            cfg, env=dataclasses.replace(cfg.env,
                                         num_envs=cfg.depth.camera_num_envs))
    if args.courses:
        cfg = dataclasses.replace(
            cfg, obstacle=dataclasses.replace(cfg.obstacle, courses=args.courses))
    if args.obstacle_curriculum:
        cfg = dataclasses.replace(
            cfg, obstacle=dataclasses.replace(cfg.obstacle, curriculum=True))
    if args.randomize_start:
        cfg = dataclasses.replace(
            cfg, env=dataclasses.replace(cfg.env, randomize_start=True))
    dr = {}
    for flag in ("randomize_base_mass", "randomize_base_com", "push_robots"):
        if getattr(args, flag):
            dr[flag] = True
    if dr:
        cfg = dataclasses.replace(
            cfg, domain_rand=dataclasses.replace(cfg.domain_rand, **dr))

    log_dir = os.path.join(args.log_root, args.proj_name, args.exptid)
    env = Go2AgilityEnv(cfg)
    bbc = load_bbc_frozen(args.bbc_path, seed=args.seed)

    mesh = None
    if args.shard or args.multihost:
        from agility_tpu.dist import mesh as dist_mesh

        mesh = dist_mesh.make_mesh()
        print(f"env-sharded over {mesh.devices.size} devices")

    if not args.use_camera:
        runner = TscOnPolicyRunner(env, bbc, TscAlgoCfg(), log_dir=log_dir,
                                   seed=args.seed, mesh=mesh)
        if args.resumeid:
            path = ckpt.latest(os.path.join(args.log_root, args.proj_name, args.resumeid))
            if path:
                print(f"resuming teacher from {path}")
                runner.load(path)
                if args.reset_std is not None:
                    import jax.numpy as jnp

                    ts_ = runner.train_state
                    ac = jax.tree_util.tree_map(lambda x: x, ts_.ac_params)
                    ac["params"]["std"] = jnp.full_like(
                        ac["params"]["std"], args.reset_std)
                    runner.train_state = ts_._replace(ac_params=ac)
                    print(f"continuous-head std reset to {args.reset_std}")
        runner.learn(args.max_iterations, log_every=args.log_every)
        runner.save(runner.current_iteration)
    else:
        # student: load the trained teacher, distill to depth
        import jax.numpy as jnp

        teacher_runner = TscOnPolicyRunner(env, bbc, TscAlgoCfg(), log_dir=None,
                                           seed=args.seed)
        src = args.resumeid or args.exptid
        path = ckpt.latest(os.path.join(args.log_root, args.proj_name, src))
        if path:
            print(f"loading teacher from {path}")
            teacher_runner.load(path)
        else:
            print("WARNING: no teacher checkpoint — distilling an untrained teacher")
        vision = TscVision(env, teacher_runner.alg,
                           teacher_runner.train_state.ac_params,
                           teacher_runner.train_state.est_params,
                           VisionCfg(), seed=args.seed)
        ts = vision.init_train_state(jax.random.PRNGKey(args.seed))
        es = jit_with_world(env.init_state, env)(
            jax.random.PRNGKey(args.seed + 1))
        it_fn = jit_with_world(vision.train_iteration, env)
        from agility_tpu.io.metrics import MetricWriter

        writer = MetricWriter(log_dir)
        import time

        for it in range(args.max_iterations):
            t0 = time.time()
            ts, es, metrics = it_fn(ts, es)
            if (it + 1) % args.log_every == 0 or it == 0:
                metrics = jax.device_get(metrics)
                writer.scalars(metrics, it)
                writer.flush()
                print(f"it {it:6d} | actor {metrics['vision/actor']:.4f} "
                      f"| yaw {metrics['vision/yaw']:.4f} "
                      f"| byol {metrics['vision/byol']:.4f} "
                      f"| {time.time() - t0:.2f}s/iter", flush=True)
            if (it + 1) % 100 == 0:
                ckpt.save(os.path.join(log_dir, "vision.msgpack"),
                          jax.device_get({"enc_params": ts.enc_params,
                                          "actor_params": ts.actor_params}),
                          step=it + 1)
        ckpt.save(os.path.join(log_dir, "vision.msgpack"),
                  jax.device_get({"enc_params": ts.enc_params,
                                  "actor_params": ts.actor_params}),
                  step=args.max_iterations)


if __name__ == "__main__":
    main()
