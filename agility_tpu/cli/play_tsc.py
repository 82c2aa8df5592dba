"""TSC evaluation (reference tsc/legged_gym/scripts/play.py): runs the
hierarchical stack — (depth encoder ->) TSC policy -> set_commands ->
frozen BBC -> env — and prints the course success rate."""
from __future__ import annotations

import argparse
import dataclasses
import os


def get_args():
    p = argparse.ArgumentParser(description="Evaluate a trained TSC policy")
    p.add_argument("--proj_name", default="agility")
    p.add_argument("--exptid", default="000")
    p.add_argument("--num_envs", type=int, default=64)
    p.add_argument("--courses", type=int, default=8)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--bbc_path", default=None)
    p.add_argument("--log_root", default="logs")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--use_camera", action="store_true",
                   help="evaluate the depth student: render depth every "
                        "update_interval steps, hold encoder outputs between "
                        "refreshes (reference tsc play.py depth path)")
    return p.parse_args()


def main():
    from agility_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    args = get_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from agility_tpu.learn.jitwrap import jit_with_world
    from agility_tpu.envs.go2_agility import Go2AgilityEnv
    from agility_tpu.envs.tsc_config import Go2AgilityCfg
    from agility_tpu.io import checkpoint as ckpt
    from agility_tpu.learn.ppo_tsc import TscAlgoCfg
    from agility_tpu.learn.runner_tsc import TscOnPolicyRunner, load_bbc_frozen
    from agility_tpu.learn import networks_tsc as tnets

    cfg = Go2AgilityCfg(seed=args.seed)
    cfg = dataclasses.replace(
        cfg,
        env=dataclasses.replace(cfg.env, num_envs=args.num_envs),
        obstacle=dataclasses.replace(cfg.obstacle, courses=args.courses),
        domain_rand=dataclasses.replace(cfg.domain_rand, randomize_action=False,
                                        action_delay=False, randomize_friction=False))
    env = Go2AgilityEnv(cfg)
    bbc = load_bbc_frozen(args.bbc_path, seed=args.seed)
    runner = TscOnPolicyRunner(env, bbc, TscAlgoCfg(), log_dir=None, seed=args.seed)
    path = ckpt.latest(os.path.join(args.log_root, args.proj_name, args.exptid))
    if path:
        print(f"loading {path}")
        runner.load(path)
    else:
        print("WARNING: no checkpoint — evaluating an untrained policy")

    alg = runner.alg
    ts = runner.train_state
    state = runner.env_state
    step = jit_with_world(env.step, env)
    set_cmd = jax.jit(env.set_commands)

    if args.use_camera:
        # depth-student stack: estimator -> depth encoder (held between
        # camera refreshes) -> student heads (reference tsc play.py)
        from agility_tpu.learn.vision_tsc import TscVision, VisionCfg

        vision = TscVision(env, alg, ts.ac_params, ts.est_params,
                           VisionCfg(), seed=args.seed)
        vts = vision.init_train_state(jax.random.PRNGKey(args.seed))
        vpath = ckpt.latest(
            os.path.join(args.log_root, args.proj_name, args.exptid),
            prefix="vision")
        student = {"enc_params": vts.enc_params,
                   "actor_params": vts.actor_params}
        if vpath:
            print(f"loading student {vpath}")
            student = ckpt.load_into(vpath, student)
        else:
            print("WARNING: no vision checkpoint — evaluating an "
                  "untrained student")
        interval = env.cfg.depth.update_interval

        @jax.jit
        def refresh(enc_params, es, hidden, key):
            obs, prop_masked = vision._prep_obs(es)
            depth = vision.render(key, es)
            return vision._encode(enc_params, depth, prop_masked, hidden)

        @jax.jit
        def act(actor_params, es, lat, dyaw, types):
            obs, _ = vision._prep_obs(es)
            dyaw_ok = jnp.abs(es.delta_yaw) < vision.cfg.delta_yaw_ok_thresh
            logits_d, mean_c = vision._act(actor_params, obs, lat, dyaw,
                                           types, dyaw_ok)
            d = jnp.argmax(logits_d, -1)
            return jnp.concatenate([d[:, None].astype(jnp.float32), mean_c],
                                   -1)

        hidden = vts.hidden
        key = jax.random.PRNGKey(args.seed + 2)
        lat = dyaw = types = None
    else:

        @jax.jit
        def act(obs, obs_bbc):
            est = alg.estimator.apply(ts.est_params, obs[:, :57])
            obs = obs.at[:, alg.slices.explicit].set(est)
            logits_d, mean_c, _ = alg.ac.apply(ts.ac_params, obs,
                                               method="heads",
                                               hist_encoding=True)
            d = jnp.argmax(logits_d, -1)
            return jnp.concatenate([d[:, None].astype(jnp.float32), mean_c],
                                   -1)

    successes = 0
    episodes = 0
    for t in range(args.steps):
        if args.use_camera:
            if t % interval == 0:
                key, k = jax.random.split(key)
                lat, dyaw, types, hidden = refresh(
                    student["enc_params"], state, hidden, k)
            hl = act(student["actor_params"], state, lat, dyaw, types)
        else:
            hl = act(state.obs_buf, state.obs_bbc_buf)
        state, next_commands = set_cmd(state, hl)
        actions_bbc = alg.bbc_act(state.obs_bbc_buf, next_commands)
        state, out = step(state, actions_bbc)
        successes += int(np.asarray(jnp.sum(out.reach_goal_cutoff & out.reset)))
        episodes += int(np.asarray(jnp.sum(out.reset)))

    rate = successes / max(1, episodes)
    print(f"episodes: {episodes}  course completions: {successes}  "
          f"success rate: {rate:.3f}")
    print(f"mean goal index at end: {float(jnp.mean(state.cur_goal_idx)):.2f}")


if __name__ == "__main__":
    main()
