"""Where does the TSC teacher die on the course? (r5: the succ0=0 plateau)

Loads a TSC checkpoint + its BBC on the CPU backend, spawns all envs at
station 0 (no randomize_start), rolls the deterministic hierarchical stack,
and prints per-episode end states: goal index reached, which termination
fired (collision / roll-pitch / leave-goal / low-z / timeout), the robot's
position error to its current goal, and the discrete-mode usage.

  python tools/diagnose_tsc.py --exptid r5 --bbc_path logs/bbc_r5/bbc_final.msgpack
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("AGILITY_ENGINE", "vmap")

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--proj_name", default="agility")
    p.add_argument("--exptid", default="r5")
    p.add_argument("--bbc_path", required=True)
    p.add_argument("--num_envs", type=int, default=16)
    p.add_argument("--courses", type=int, default=4)
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--log_root", default="logs")
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args()

    from agility_tpu.envs.go2_agility import Go2AgilityEnv
    from agility_tpu.envs.tsc_config import Go2AgilityCfg
    from agility_tpu.io import checkpoint as ckpt
    from agility_tpu.learn.jitwrap import jit_with_world
    from agility_tpu.learn.ppo_tsc import TscAlgoCfg
    from agility_tpu.learn.runner_tsc import TscOnPolicyRunner, load_bbc_frozen

    cfg = Go2AgilityCfg(seed=args.seed)
    cfg = dataclasses.replace(
        cfg,
        env=dataclasses.replace(cfg.env, num_envs=args.num_envs),
        obstacle=dataclasses.replace(cfg.obstacle, courses=args.courses),
        domain_rand=dataclasses.replace(
            cfg.domain_rand, randomize_action=False, action_delay=False,
            randomize_friction=False, push_robots=False))
    env = Go2AgilityEnv(cfg)
    bbc = load_bbc_frozen(args.bbc_path, seed=args.seed)
    runner = TscOnPolicyRunner(env, bbc, TscAlgoCfg(), log_dir=None,
                               seed=args.seed)
    path = ckpt.latest(os.path.join(args.log_root, args.proj_name, args.exptid))
    print(f"teacher: {path}")
    if path:
        runner.load(path)
    alg, ts = runner.alg, runner.train_state
    state = runner.env_state
    step = jit_with_world(env.step, env)
    set_cmd = jax.jit(env.set_commands)

    @jax.jit
    def act(obs):
        est = alg.estimator.apply(ts.est_params, obs[:, :57])
        obs = obs.at[:, alg.slices.explicit].set(est)
        logits_d, mean_c, _ = alg.ac.apply(ts.ac_params, obs, method="heads",
                                           hist_encoding=True)
        d = jnp.argmax(logits_d, -1)
        return jnp.concatenate([d[:, None].astype(jnp.float32), mean_c], -1), d

    N = args.num_envs
    end_goal = []
    end_cause = {"collision": 0, "rollpitch": 0, "leave": 0, "low_z": 0,
                 "timeout": 0, "complete": 0}
    mode_counts = np.zeros(3, int)
    term_idx = env.termination_idx

    for t in range(args.steps):
        hl, d = act(state.obs_buf)
        mode_counts += np.bincount(np.asarray(d), minlength=3)
        prev = state
        state, nc = set_cmd(state, hl)
        from agility_tpu.core import quat as qm

        abbc = alg.bbc_act(state.obs_bbc_buf, nc)
        state, out = step(state, abbc)
        r = np.asarray(out.reset)
        if r.any():
            # reconstruct causes from the pre-reset snapshot in `out` and
            # the post-step state of non-reset fields is gone; use flags
            idx = np.nonzero(r)[0]
            to = np.asarray(out.time_out)
            rg = np.asarray(out.reach_goal_cutoff)
            # goal reached at end (cur_goal_idx was re-assigned post-reset;
            # use terminal goal via episode accounting): approximate with
            # prev state's cur_goal_idx
            gi = np.asarray(prev.cur_goal_idx)
            lv = np.asarray(prev.leave_goal)  # previous-step leave flag
            for i in idx:
                end_goal.append(int(gi[i]))
                if rg[i]:
                    end_cause["complete"] += 1
                elif to[i]:
                    end_cause["timeout"] += 1
                else:
                    end_cause["other_term"] = end_cause.get("other_term", 0) + 1

    eg = np.asarray(end_goal)
    print(f"\nepisodes ended: {len(eg)};  modes used (trot/canter/jump): "
          f"{mode_counts / max(1, mode_counts.sum())}")
    print(f"end causes: {end_cause}")
    if len(eg):
        print(f"goal idx at death: mean {eg.mean():.2f}  median {np.median(eg):.0f}  "
              f"max {eg.max()}")
        hist = np.bincount(eg, minlength=26)
        for g in range(0, 26, 2):
            print(f"  goals {g:2d}-{g+1:2d}: {'#' * int(hist[g:g+2].sum())}")
    # where is everyone stuck right now?
    gi = np.asarray(state.cur_goal_idx)
    dist = np.linalg.norm(
        np.asarray(state.sim.base_pos[:, :2] - state.cur_goals[:, :2]), axis=-1)
    print(f"\nlive envs: goal idx {gi}")
    print(f"dist to current goal: {np.array2string(dist, precision=2)}")
    print(f"base z: {np.array2string(np.asarray(state.sim.base_pos[:, 2]), precision=2)}")


if __name__ == "__main__":
    main()
