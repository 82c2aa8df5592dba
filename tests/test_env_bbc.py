"""BBC env integration tests: shapes, determinism, reset semantics."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from agility_tpu.envs.config import Go2LocomotionCfg, EnvCfg, TerrainCfg, smoke_cfg
from agility_tpu.core import quat as qm
from agility_tpu.envs.go2_locomotion import Go2LocomotionEnv


@pytest.fixture(scope="module")
def env():
    return Go2LocomotionEnv(smoke_cfg(num_envs=8))


# jit once per module: `jax.jit(env.step)` at each call site creates a new
# bound-method wrapper -> a fresh ~20 s XLA-CPU compile per test.  Shared
# jitted entry points keep the suite compile count at one per program.
@pytest.fixture(scope="module")
def step(env):
    return jax.jit(env.step)


@pytest.fixture(scope="module")
def init(env):
    return jax.jit(env.init_state)


@pytest.fixture(scope="module")
def rollout(env, init, step):
    key = jax.random.PRNGKey(0)
    state = init(key)
    outs = []
    for i in range(10):
        acts = jax.random.normal(jax.random.PRNGKey(i), (8, 12)) * 0.1
        state, out = step(state, acts)
        outs.append(out)
    return state, outs


def test_obs_shapes(env, rollout):
    state, outs = rollout
    o = outs[-1]
    assert o.obs.shape == (8, 671)
    assert o.privileged_obs.shape == (8, 671)
    assert o.disc_obs.shape == (8, 49)
    assert o.rew.shape == (8,)
    assert np.isfinite(np.asarray(o.obs)).all()
    assert np.isfinite(np.asarray(o.rew)).all()


def test_obs_layout(env, rollout):
    """Key-pos block of prop obs must be zeroed (legged_robot.py:284);
    latent c one-hot appears at the tail."""
    state, outs = rollout
    o = np.asarray(outs[-1].obs)
    np.testing.assert_allclose(o[:, 45:57], 0.0)       # flat_key_pos * 0
    c = o[:, -5:]                                      # latent c one-hot
    np.testing.assert_allclose(c[:, 0], 1.0)           # walk = category 0
    np.testing.assert_allclose(c[:, 1:], 0.0)


def test_rewards_mostly_positive(env, rollout):
    _, outs = rollout
    r = np.concatenate([np.asarray(o.rew) for o in outs])
    assert (r >= 0).all()  # only_positive_rewards clips at 0


def test_deterministic(env, init, step):
    key = jax.random.PRNGKey(0)
    s1 = init(key)
    s2 = init(key)
    a = jnp.zeros((8, 12))
    o1 = step(s1, a)[1]
    o2 = step(s2, a)[1]
    np.testing.assert_array_equal(np.asarray(o1.obs), np.asarray(o2.obs))


def test_timeout_resets(env, init, step):
    """Run past the episode length; episode_length must wrap."""
    key = jax.random.PRNGKey(1)
    state = init(key)
    max_len = env.max_episode_length
    n_steps = max_len + 2
    saw_reset = False
    for _ in range(n_steps):
        state, out = step(state, jnp.zeros((8, 12)))
        saw_reset |= bool(np.asarray(out.reset).any())
    assert saw_reset
    assert int(jnp.max(state.episode_length)) <= max_len + 1


def test_full_cfg_builds():
    """Full rough-terrain mocap config constructs and steps (tiny batch)."""
    cfg = Go2LocomotionCfg(
        env=EnvCfg(num_envs=4),
        terrain=TerrainCfg(num_rows=2, num_cols=2, border_size=5.0),
    )
    env = Go2LocomotionEnv(cfg)
    state = env.init_state(jax.random.PRNGKey(0))
    state, out = jax.jit(env.step)(state, jnp.zeros((4, 12)))
    assert np.isfinite(np.asarray(out.obs)).all()
    assert out.obs.shape == (4, 671)
    # mocap init: dof positions should differ from default for some envs
    assert np.asarray(state.latent_c).sum(-1).max() == 1.0


def test_recovery_init():
    """With recovery_init_prob=1 every reset spawns the randomized fallen
    pose (uniform orientation, dofs x U(0.5, 2), root vel +-0.5) —
    reference _reset_dofs_rec/_reset_root_states_rec (legged_robot.py:
    208-211, 636-661)."""
    import dataclasses

    cfg = smoke_cfg(num_envs=16)
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, recovery_init_prob=1.0))
    env = Go2LocomotionEnv(cfg)
    es = env.init_state(jax.random.PRNGKey(0))
    mask = jnp.ones(16, bool)
    es2 = env._reset_where(es, mask, jax.random.PRNGKey(3))
    # orientations are uniformly random, not upright
    up = np.asarray(qm.quat_rotate(es2.sim.base_quat,
                                   jnp.tile(jnp.array([0.0, 0.0, 1.0]), (16, 1))))
    assert (up[:, 2] < 0.5).any(), "expected some fallen orientations"
    # dof scaling in [0.5, 2] x default
    d = np.asarray(env.mc.default_dof_pos)
    nz = np.abs(d) > 1e-6
    ratio = np.asarray(es2.sim.dof_pos)[:, nz] / d[nz]
    assert ratio.min() >= 0.5 - 1e-5 and ratio.max() <= 2.0 + 1e-5
    assert np.abs(np.asarray(es2.sim.u[:, :6])).max() <= 0.5 + 1e-5


def test_expert_disc_features_match_env_features():
    """Expert-side disc features (mocap.disc_obs_from_frames) must be
    computed in the SAME frames as the policy side (compute_disc_features)
    — in particular base-frame velocities (reference motion_loader.py:
    210-212 quat_rotate_inverse vs legged_robot.py:137-141).  A frame
    convention mismatch makes expert/policy trivially separable and kills
    the style reward (disc accuracy pins at 1.0); this builds a mocap
    frame vector FROM a live sim state and asserts both feature paths
    agree."""
    from agility_tpu.envs import mocap
    from agility_tpu.envs.config import smoke_cfg
    from agility_tpu.envs.go2_locomotion import Go2LocomotionEnv, compute_disc_features
    from agility_tpu.physics import soa

    env = Go2LocomotionEnv(smoke_cfg(num_envs=4))
    state = env.init_state(jax.random.PRNGKey(0))
    # a dynamically interesting state: random joint velocities + base twist
    # and a definitely-non-identity base orientation (so world-frame vs
    # base-frame mistakes cannot cancel)
    from agility_tpu.core import quat as qm

    yaw = jnp.asarray([0.3, 1.2, -2.0, 2.9])
    roll = jnp.asarray([0.05, -0.1, 0.2, 0.0])
    sim = state.sim._replace(
        base_quat=qm.quat_from_euler_xyz(roll, jnp.zeros(4), yaw),
        u=0.5 * jax.random.normal(jax.random.PRNGKey(1), state.sim.u.shape))
    toe_w = soa.body_positions(env.mc, sim, env.feet_idx)        # (N, 4, 3)

    frames = jnp.concatenate([
        sim.base_pos, sim.base_quat, sim.dof_pos,
        toe_w.reshape(4, 12), sim.u[:, :3], sim.u[:, 3:6], sim.u[:, 6:18],
    ], axis=-1)
    assert frames.shape[-1] == mocap.FRAME_DIM

    osc = env.cfg.normalization.obs_scales
    expert_side = mocap.disc_obs_from_frames(frames, env.mc.default_dof_pos, osc)

    contact = toe_w[:, :, 2] < 0.025
    root_h = sim.base_pos[:, 2:3]
    policy_side = compute_disc_features(
        env.mc, env.feet_idx, osc, sim, contact, root_h)
    np.testing.assert_allclose(np.asarray(expert_side),
                               np.asarray(policy_side), atol=1e-5)
