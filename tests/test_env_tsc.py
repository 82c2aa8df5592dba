"""TSC agility env + teacher training smoke tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from agility_tpu.envs.tsc_config import tsc_smoke_cfg
from agility_tpu.envs.go2_agility import Go2AgilityEnv
from agility_tpu.learn.ppo_tsc import TscAlgoCfg
from agility_tpu.learn.runner_tsc import TscOnPolicyRunner, load_bbc_frozen
from agility_tpu.terrain import obstacle as obst_gen


def test_course_generation():
    cfg = tsc_smoke_cfg(num_envs=4, courses=2).obstacle
    world = obst_gen.generate(cfg, seed=0)
    assert world.goals.shape == (2, 26, 3)
    assert set(np.unique(world.obst_types)) == set(range(6))
    # each course has all six obstacle types exactly once
    for ci in range(2):
        assert sorted(world.obst_types[ci]) == list(range(6))
    # heights are sane (tire sill canonical profile dips to -0.4 until the
    # per-env tire height weight is added)
    assert world.height.max() <= 2.01
    assert world.height.min() >= -0.41
    # movable layers exist (bar + tire)
    assert (world.layer_id == obst_gen.LAYER_BAR).sum() > 0
    assert (world.layer_id == obst_gen.LAYER_TIRE).sum() > 0
    # goals live inside their course cells (x within [-5, rows*7+5])
    assert np.isfinite(world.goals).all()


@pytest.fixture(scope="module")
def env():
    return Go2AgilityEnv(tsc_smoke_cfg(num_envs=4, courses=2))


# one jitted step/init per module: per-test `jax.jit(env.step)` wrappers
# each pay a fresh ~20 s XLA-CPU compile (bound-method identity misses the
# jit cache)
@pytest.fixture(scope="module")
def step(env):
    return jax.jit(env.step)


@pytest.fixture(scope="module")
def init(env):
    return jax.jit(env.init_state)


def test_env_shapes_and_step(env, init, step):
    state = init(jax.random.PRNGKey(0))
    assert state.obs_buf.shape == (4, 800)
    assert state.obs_bbc_buf.shape == (4, 671)
    # hierarchical bridge: random HL actions -> commands in per-mode ranges
    hl = jnp.concatenate(
        [jnp.zeros((4, 1)),  # discrete: first active mode (trot)
         jnp.zeros((4, 18))], axis=-1)
    state2, next_commands = env.set_commands(state, hl)
    assert next_commands.shape == (4, 11)
    c = np.asarray(state2.latent_c)
    np.testing.assert_allclose(c[:, 2], 1.0)  # trot == global mode 2
    # mid-range continuous action 0 -> vx at the middle of trot range
    vx = np.asarray(state2.commands[:, 0])
    if not env.cfg.domain_rand.randomize_action:
        np.testing.assert_allclose(vx, 1.0, atol=1e-5)  # (0.5+1.5)/2
    state3, out = step(state2, jnp.zeros((4, 12)))
    assert np.isfinite(np.asarray(out.obs)).all()
    assert np.isfinite(np.asarray(out.rew)).all()
    assert out.disc_obs.shape == (4, 49)


def test_goal_progression(env, init, step):
    """Teleport the robot onto its first goal: the reach machinery must
    advance the goal index within a few steps."""
    state = init(jax.random.PRNGKey(1))
    goal = state.cur_goals
    sim = state.sim._replace(
        base_pos=state.sim.base_pos.at[:, :2].set(goal[:, :2]))
    state = state._replace(sim=sim)
    for _ in range(4):
        state, out = step(state, jnp.zeros((4, 12)))
        sim = state.sim._replace(
            base_pos=state.sim.base_pos.at[:, :2].set(state.cur_goals[:, :2]),
            u=state.sim.u * 0)
        state = state._replace(sim=sim)
    assert int(jnp.max(state.cur_goal_idx)) >= 1


def test_seesaw_tilts_under_robot(env, init, step):
    """Drop the robot on the far (+x local) half of its seesaw plank: the
    passive 1-DOF plank (reference tsc legged_robot.py:1414-1427) must tilt
    away from rest under the contact torque."""
    state = init(jax.random.PRNGKey(2))
    types = np.asarray(env.obst_types)                      # (N, 6)
    station = np.argmax(types == obst_gen.OBST_TYPES.index("seesaw"), axis=1)
    pivot_goal = station * env.num_goals + 2
    goals = np.asarray(env.env_goals)                       # (N, G, 3)
    pivot = goals[np.arange(4), pivot_goal]                 # (N, 3) plank center
    yaws = np.asarray(env.world.obst_yaws)[env.course_id[:4]]
    yaw = yaws[np.arange(4), station]
    arm = 0.5
    x = pivot[:, 0] + arm * np.cos(yaw)
    y = pivot[:, 1] + arm * np.sin(yaw)
    z = np.full(4, obst_gen.SEESAW_PIVOT_H + arm * obst_gen.SEESAW_THETA_REST + 0.35)
    sim = state.sim._replace(
        base_pos=jnp.asarray(np.stack([x, y, z], -1), jnp.float32),
        u=state.sim.u * 0)
    state = state._replace(
        sim=sim,
        cur_goal_idx=jnp.asarray(pivot_goal, jnp.int32),
        cur_goals=jnp.asarray(pivot, jnp.float32))
    for _ in range(40):
        state, out = step(state, jnp.zeros((4, 12)))
    th = np.asarray(state.seesaw_theta)
    assert np.isfinite(th).all()
    # plank left its rest angle on every env (robot weight beyond the pivot)
    assert (th < obst_gen.SEESAW_THETA_REST - 0.05).all()


def test_tsc_training_smoke(tmp_path):
    env = Go2AgilityEnv(tsc_smoke_cfg(num_envs=4, courses=2))
    bbc = load_bbc_frozen(None)
    cfg = TscAlgoCfg(num_steps_per_env=4, num_learning_epochs=1, num_mini_batches=2)
    runner = TscOnPolicyRunner(env, bbc, cfg, log_dir=str(tmp_path), seed=0)
    runner.learn(2, log_every=1)
    flat, _ = jax.flatten_util.ravel_pytree(runner.train_state.ac_params)
    assert np.isfinite(np.asarray(flat)).all()
    p = runner.save(2)
    runner.load(p)


def test_scan_window_covers_rotated_grid(env, init):
    """Auto-sized scan windows (centered on the rotated scan-grid
    circumcenter, env.scan_size cells) must cover every scandot at ANY
    yaw: patch-path measurement == full-grid min3 fallback.  Guards the
    56 -> scan_size row-count reduction (PERF_NOTES r3 lever)."""
    from agility_tpu.core import quat as qm
    from agility_tpu.physics import heightfield as hf
    from agility_tpu.physics import patch as pt

    # the 12x11 grid at 0.05 m: circumradius 0.744 m -> 34-cell windows
    assert env.scan_size == 34

    state = init(jax.random.PRNGKey(0))
    N = env.num_envs
    # adversarial yaws: axis-aligned and diagonal corner orientations
    yaws = jnp.asarray([0.0, np.pi / 4, np.pi / 2, 2.4])[:N]
    zero = jnp.zeros(N)
    bq = qm.quat_from_euler_xyz(zero, zero, yaws)
    base_pos = state.sim.base_pos

    w = env._weights(state)
    pts = qm.quat_apply_yaw(bq[:, None, :], env.height_points) + base_pos[:, None, :]
    centers = (qm.quat_apply_yaw(bq, env.scan_center_local) + base_pos)[:, :2]
    got = pt.measure_scandots_batch(
        env.grid, centers, env.scan_size, w, pts[..., 0], pts[..., 1])
    ref = jax.vmap(
        lambda p, wi: hf.sample_height_min3(env.grid, p[:, 0], p[:, 1], wi)
    )(pts, w)
    # bf16 scan stack rounds heights (<1 cm at course scales); a clipped
    # (uncovered) scandot would miss by decimeters
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0.02)


def test_randomize_start_spawns_at_stations():
    """randomize_start (reference tsc legged_robot.py:367-375): reset envs
    spawn at a random station's approach goal with the station heading and
    cur_goal_idx = station * num_goals."""
    import dataclasses

    from agility_tpu.envs.tsc_config import tsc_smoke_cfg
    from agility_tpu.envs.go2_agility import Go2AgilityEnv

    cfg = tsc_smoke_cfg(num_envs=32, courses=2)
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, randomize_start=True))
    env = Go2AgilityEnv(cfg)
    state = env.init_state(jax.random.PRNGKey(3))
    gi = np.asarray(state.cur_goal_idx)
    ng = cfg.obstacle.num_goals
    assert (gi % ng == 0).all()
    assert len(np.unique(gi // ng)) >= 3      # several stations hit
    # spawn xy near the chosen goal (within the start noise)
    goals = np.asarray(env.env_goals)
    chosen = goals[np.arange(32), gi]
    pos = np.asarray(state.sim.base_pos)
    assert np.abs(pos[:, :2] - chosen[:, :2]).max() < 0.35
    # stepping from a station spawn stays finite
    s2, out = jax.jit(env.step)(state, jnp.zeros((32, 12)))
    assert np.isfinite(np.asarray(out.obs)).all()
