"""Overhang (ceiling) collision + seesaw 1-DOF plank geometry.

The reference robot must crouch *under* the tunnel roof and jump *through*
the tire aperture (URDF collision meshes loaded at
tsc/legged_gym/envs/base/legged_robot.py:1260-1289), and the seesaw is a
passive revolute plank (:1414-1427).  Our TPU design expresses the roofs as
a second "ceiling" heightfield surface and the plank as a lever grid scaled
by a per-env angle; these tests pin the geometry, the ray-caster, and the
contact response.
"""
import numpy as np
import jax
import jax.numpy as jnp

from agility_tpu.core.urdf import build_go2_model
from agility_tpu.physics import engine as eng
from agility_tpu.physics import heightfield as hf
from agility_tpu.physics.constants import ModelConsts
from agility_tpu.render import raycast
from agility_tpu.terrain import obstacle as obst_gen

MC = ModelConsts.from_model(build_go2_model())


def _flat_world(ceiling_z=None, n=64, hscale=0.05):
    h = np.zeros((n, n), np.float32)
    ceil = None if ceiling_z is None else np.full((n, n), ceiling_z, np.float32)
    return hf.from_numpy(h, hscale, origin_xy=(-n * hscale / 2, -n * hscale / 2),
                         ceiling=ceil)


def test_world_gen_has_roofs_and_lever():
    from agility_tpu.envs.tsc_config import tsc_smoke_cfg

    cfg = tsc_smoke_cfg(num_envs=4, courses=2).obstacle
    world = obst_gen.generate(cfg, seed=0)
    # tunnel roof: some cells have a real ceiling below open-sky sentinel
    roofed = world.ceil < obst_gen.NO_CEILING
    assert roofed.sum() > 50
    # tire top ring: ceiling cells tagged with the tire layer so the ring
    # follows the per-env joint height
    assert (world.ceil_layer == obst_gen.LAYER_TIRE).sum() > 10
    # under every finite ceiling there is clearance above the floor
    assert (world.ceil[roofed] >= world.height[roofed] - 1e-5).all()
    # seesaw plank: signed lever arms, flat plank at pivot height
    on_plank = world.lever != 0
    assert on_plank.sum() > 100
    assert world.lever.min() < -1.0 and world.lever.max() > 1.0
    np.testing.assert_allclose(world.height[on_plank],
                               obst_gen.SEESAW_PIVOT_H, atol=1e-6)


def test_analytic_lever_matches_raster_grid():
    """obstacle.lever_arm (the env hot path) must reproduce the rasterized
    lever grid on the plank interior: the raster is a nearest-neighbor
    image of the same linear field, so bilinear samples agree to within a
    node spacing of the plank edge."""
    from agility_tpu.envs.tsc_config import tsc_smoke_cfg

    cfg = tsc_smoke_cfg(num_envs=4, courses=2).obstacle
    world = obst_gen.generate(cfg, seed=0)
    grid = hf.from_numpy(world.height, world.hscale, world.origin,
                         lever=world.lever)
    rng = np.random.default_rng(1)
    for ci in range(2):
        pose = jnp.asarray(world.seesaw_pose[ci], jnp.float32)
        px, py, yaw, t_lo, t_hi = world.seesaw_pose[ci]
        assert not (px == 0 and py == 0), "seesaw pose not exported"
        assert t_lo < -1.0 and t_hi > 1.0, "raster plank extent missing"
        # interior points: strictly inside the surviving plank raster,
        # away from edges/truncations where bilinear feathering differs
        t = rng.uniform(t_lo + 3 * world.hscale,
                        t_hi - 3 * world.hscale, 64)
        w = rng.uniform(-obst_gen.SEESAW_WIDTH / 2 + 2 * world.hscale,
                        obst_gen.SEESAW_WIDTH / 2 - 2 * world.hscale, 64)
        x = px + np.cos(yaw) * t - np.sin(yaw) * w
        y = py + np.sin(yaw) * t + np.cos(yaw) * w
        analytic = obst_gen.lever_arm(pose[None, :], jnp.asarray(x),
                                      jnp.asarray(y))
        sampled = hf.sample_lever(grid, jnp.asarray(x), jnp.asarray(y))
        # NN rotation of the raster quantizes to +-hscale; bilinear feathers
        np.testing.assert_allclose(np.asarray(analytic), np.asarray(sampled),
                                    atol=2.1 * world.hscale)
        np.testing.assert_allclose(np.asarray(analytic), t, atol=1e-5)
        # off the plank: zero
        off = obst_gen.lever_arm(
            pose[None, :],
            jnp.asarray(px + np.cos(yaw) * (obst_gen.SEESAW_HALF_LEN + 0.3)),
            jnp.asarray(py + np.sin(yaw) * (obst_gen.SEESAW_HALF_LEN + 0.3)))
        assert float(jnp.abs(off).max()) == 0.0


def test_seesaw_height_follows_theta():
    cfg = obst_gen.ObstacleCfg()
    cell = obst_gen._Cell(cfg)
    pos = (3.5, 5.0)
    obst_gen._seesaw(cell, pos)
    grid = hf.from_numpy(cell.h, cfg.horizontal_scale, origin_xy=(0.0, 0.0),
                         layer_id=cell.layer, lever=cell.lever)
    L = obst_gen.SEESAW_HALF_LEN - 0.1
    th = obst_gen.SEESAW_THETA_REST
    w_rest = jnp.asarray([0.0, 0.0, th])
    w_flat = jnp.asarray([0.0, 0.0, 0.0])
    # rest: approach (-x) end on the ground, far end up
    h_near = float(hf.sample_height(grid, jnp.asarray(pos[0] - L),
                                    jnp.asarray(pos[1]), w_rest))
    h_far = float(hf.sample_height(grid, jnp.asarray(pos[0] + L),
                                   jnp.asarray(pos[1]), w_rest))
    assert abs(h_near - (obst_gen.SEESAW_PIVOT_H - L * th)) < 2e-2
    assert abs(h_far - (obst_gen.SEESAW_PIVOT_H + L * th)) < 2e-2
    # level plank
    h_mid = float(hf.sample_height(grid, jnp.asarray(pos[0] + L),
                                   jnp.asarray(pos[1]), w_flat))
    assert abs(h_mid - obst_gen.SEESAW_PIVOT_H) < 2e-2
    # raw lever sampler used for the torque coupling
    lv = float(hf.sample_lever(grid, jnp.asarray(pos[0] + L), jnp.asarray(pos[1])))
    assert abs(lv - L) < 2e-2


def test_raycast_sees_ceiling():
    cam = raycast.make_camera(width=16, height=12, near=0.1, far=3.0, n_steps=48)
    bp = jnp.asarray([0.0, 0.0, 0.25])
    bq = jnp.asarray([0.0, 0.0, 0.0, 1.0])
    open_sky = raycast.render_depth(cam, _flat_world(None), bp, bq,
                                    cam_pitch=-0.5)
    roofed = raycast.render_depth(cam, _flat_world(0.5), bp, bq,
                                  cam_pitch=-0.5)
    top_open = np.asarray(open_sky)[:4]    # upward-pointing rows
    top_roof = np.asarray(roofed)[:4]
    # without a ceiling the upward rays escape to far; with one they hit it
    assert (top_open > 2.9).mean() > 0.9
    assert (top_roof < 1.5).mean() > 0.9
    assert np.isfinite(np.asarray(roofed)).all()


def _standing_state(n, z):
    return eng.EnvState(
        base_pos=jnp.tile(jnp.asarray([0.0, 0.0, z]), (n, 1)),
        base_quat=jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (n, 1)),
        dof_pos=jnp.tile(MC.default_dof_pos, (n, 1)),
        u=jnp.zeros((n, 18)))


def _neutral_params(n):
    return eng.EnvParams(
        friction=jnp.ones(n), kp_scale=jnp.ones((n, 12)),
        kd_scale=jnp.ones((n, 12)), added_base_mass=jnp.zeros(n),
        base_com_shift=jnp.zeros((n, 3)))


def test_ceiling_contact_pushes_robot_down():
    n = 2
    cfg = eng.EngineConfig(soa=True, patch_size=16)
    control = eng.Control(target=jnp.tile(MC.default_dof_pos, (n, 1)),
                          kp=jnp.full((n, 12), 40.0), kd=jnp.full((n, 12), 1.0))
    params = _neutral_params(n)

    def run(grid, steps=60):
        step = jax.jit(lambda st: eng.step_batch(
            MC, cfg, grid, st, control, params)[0])
        s = _standing_state(n, 0.42)
        for _ in range(steps):
            s = step(s)
        return float(np.asarray(s.base_pos[:, 2]).mean()), s

    z_free, _ = run(_flat_world(None))
    z_squeezed, s = run(_flat_world(0.26))
    assert np.isfinite(np.asarray(s.base_pos)).all()
    # free PD stance sags to ~0.25; a 0.26 m ceiling (base spheres r=0.057)
    # presses the trunk down until it clears the roof
    assert z_free > 0.24
    assert z_squeezed < z_free - 0.03
    assert z_squeezed < 0.22
