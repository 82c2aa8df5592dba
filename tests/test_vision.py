"""Depth ray-caster + student distillation smoke tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from agility_tpu.envs.tsc_config import tsc_smoke_cfg, DepthCfg
from agility_tpu.envs.go2_agility import Go2AgilityEnv
from agility_tpu.learn.ppo_tsc import TscAlgoCfg, TscPPO
from agility_tpu.learn.runner_tsc import load_bbc_frozen
from agility_tpu.learn.vision_tsc import TscVision, VisionCfg
from agility_tpu.physics import heightfield as hf
from agility_tpu.render import raycast


def test_raycast_flat_ground_depth():
    """Camera 0.4 m above flat ground, pitched down: center-bottom rays hit
    the ground at predictable distances; horizon rays miss (far)."""
    cam = raycast.make_camera(width=21, height=15, n_steps=64)
    grid = hf.flat_grid(50.0)
    base_pos = jnp.array([0.0, 0.0, 0.3])
    base_quat = jnp.array([0.0, 0.0, 0.0, 1.0])
    d = raycast.render_depth(cam, grid, base_pos, base_quat, cam_pitch=0.4)
    d = np.asarray(d)
    assert d.shape == (15, 21)
    # bottom rows look down -> closer than top rows
    assert d[-1].mean() < d[0].mean()
    # camera height 0.398; bottom-center ray pitch ~ 0.4 + atan(7/13.1) rad
    assert 0.3 <= d[-1, 10] <= 1.5, d[-1, 10]
    # top rows point above horizon -> no hit -> far
    assert d[0].max() >= cam.far - 1e-3


def test_raycast_wall():
    """A 2 m wall 1.5 m ahead must cap forward depth near 1.2 m (measured
    from the camera, mounted 0.305 m ahead of base)."""
    import numpy as onp
    h = onp.zeros((100, 100), onp.float32)
    h[65:, :] = 2.0   # wall from x = 1.5 (origin -5, scale 0.1)
    grid = hf.from_numpy(h, 0.1, origin_xy=(-5.0, -5.0))
    cam = raycast.make_camera(width=11, height=9, n_steps=64)
    d = raycast.render_depth(cam, grid, jnp.array([0.0, 0.0, 0.4]),
                             jnp.array([0.0, 0.0, 0.0, 1.0]))
    center = float(d[4, 5])
    assert 1.0 < center < 1.35, center


@pytest.mark.slow
def test_vision_distillation_smoke():
    cfg = tsc_smoke_cfg(num_envs=2, courses=1)
    cfg = cfg.__class__(**{**cfg.__dict__, "depth": DepthCfg(
        use_camera=True, resized=(30, 20))})
    env = Go2AgilityEnv(cfg)
    bbc = load_bbc_frozen(None)
    teacher = TscPPO(env, bbc, TscAlgoCfg(num_steps_per_env=2), seed=0)
    tts = teacher.init_train_state(jax.random.PRNGKey(0))
    vision = TscVision(env, teacher, tts.ac_params, tts.est_params,
                       VisionCfg(num_steps_per_env=3, byol_minibatches=2), seed=0)
    ts = vision.init_train_state(jax.random.PRNGKey(1))
    es = env.init_state(jax.random.PRNGKey(2))
    it_fn = jax.jit(vision.train_iteration)
    ts, es, metrics = it_fn(ts, es)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    flat, _ = jax.flatten_util.ravel_pytree(ts.enc_params)
    assert np.isfinite(np.asarray(flat)).all()


@pytest.mark.slow
def test_vision_student_catches_teacher():
    """Distillation makes progress at toy scale: over a dozen iterations on
    a fixed course the student's imitation loss (discrete + continuous
    action heads regressed onto the frozen teacher's actions) must drop
    (VERDICT r1 weak #7; reference evidence is the vision runner's
    depth_actor loss curve, tsc rsl_rl ppo.py:327-358)."""
    cfg = tsc_smoke_cfg(num_envs=2, courses=1)
    cfg = cfg.__class__(**{**cfg.__dict__, "depth": DepthCfg(
        use_camera=True, resized=(30, 20))})
    env = Go2AgilityEnv(cfg)
    bbc = load_bbc_frozen(None)
    teacher = TscPPO(env, bbc, TscAlgoCfg(num_steps_per_env=2), seed=0)
    tts = teacher.init_train_state(jax.random.PRNGKey(0))
    vision = TscVision(env, teacher, tts.ac_params, tts.est_params,
                       VisionCfg(num_steps_per_env=3, byol_minibatches=2),
                       seed=0)
    ts = vision.init_train_state(jax.random.PRNGKey(1))
    es = env.init_state(jax.random.PRNGKey(2))
    it_fn = jax.jit(vision.train_iteration)
    losses = []
    for _ in range(12):
        ts, es, metrics = it_fn(ts, es)
        losses.append(float(metrics["vision/actor"]))
    losses = np.asarray(losses)
    assert np.isfinite(losses).all(), losses
    assert losses[-3:].mean() < losses[:3].mean(), losses
