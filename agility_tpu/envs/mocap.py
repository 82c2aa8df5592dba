"""Mocap reference-motion data: loading, retargeting bookkeeping, and
device-side sampling.

JAX re-design of the reference MotionLoader (bbc/rsl_rl/datasets/
motion_loader.py): clips are loaded once on the host into flat device tables,
and all sampling (state-init frames at reset, discriminator expert
transitions) happens on device as gathers + lerp/slerp, conditioned on the
behavior-mode latent.

Frame layout (49 columns, after preprocessing — motion_loader.py:19-50):
  [0:3]   root position (world)          [3:7]   root quaternion xyzw
  [7:19]  joint positions (12)           [19:31] toe positions (world, 4x3)
  [31:34] root linear velocity (local)   [34:37] root angular velocity (local)
  [37:49] joint velocities (12)

Preprocessing matches motion_loader.reorder (:251-302): PyBullet leg order
[FR, FL, RR, RL] -> [FL, FR, RL, RR], hip-angle sign flips, and the
foot-to-ground height shift.  If no dataset directory is given, procedurally
generated gait clips keep the framework self-contained.
"""
from __future__ import annotations

import glob
import json
import os
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from agility_tpu.core import quat as qm

# column slices
ROOT_POS = slice(0, 3)
ROOT_ROT = slice(3, 7)
JOINT_POS = slice(7, 19)
TOE_POS = slice(19, 31)
LIN_VEL = slice(31, 34)
ANG_VEL = slice(34, 37)
JOINT_VEL = slice(37, 49)
FRAME_DIM = 49


def _reorder_pb_to_fk(frames: np.ndarray) -> np.ndarray:
    """PyBullet [FR, FL, RR, RL] -> [FL, FR, RL, RR] with hip sign flips and
    per-leg foot-to-ground shift (reference motion_loader.py:251-302)."""
    out = frames.copy()

    def swap_legs(block):   # (F, 12) ordered FR FL RR RL -> FL FR RL RR
        fr, fl, rr, rl = np.split(block, 4, axis=1)
        return np.hstack([fl, fr, rl, rr])

    jp = swap_legs(frames[:, JOINT_POS])
    jp[:, [0, 3, 6, 9]] *= -1.0     # hip sign flip (all legs)
    jv = swap_legs(frames[:, JOINT_VEL])
    jv[:, [0, 3, 6, 9]] *= -1.0

    toes = swap_legs(frames[:, TOE_POS]).reshape(-1, 4, 3)
    mins = toes[:, :, 2].min(axis=0)                 # per-leg min height
    out[:, 2] -= float(mins.mean())                  # shift root down
    toes[:, :, 2] -= mins[None, :]                   # feet touch ground
    out[:, JOINT_POS] = jp
    out[:, JOINT_VEL] = jv
    out[:, TOE_POS] = toes.reshape(-1, 12)

    q = out[:, ROOT_ROT]
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    out[:, ROOT_ROT] = np.where(q[:, 3:4] < 0, -q, q)
    return out


class MotionData(NamedTuple):
    categories: tuple
    # labeled clips
    frames: jnp.ndarray        # (F, 49)
    clip_start: np.ndarray     # (K,) first frame index
    clip_frames: np.ndarray    # (K,) n frames
    clip_dur: np.ndarray       # (K,) frame duration [s]
    clip_len: np.ndarray       # (K,) trajectory length [s]
    weights: np.ndarray        # (K,) normalized sampling weights
    label: np.ndarray          # (K,) category index
    # unlabeled (one concatenated trajectory, reference :180-186)
    ulb_frames: jnp.ndarray    # (F2, 49)
    ulb_dur: float

    @property
    def num_clips(self) -> int:
        return len(self.clip_start)

    # ------------------------------------------------------------------
    def _cat_logits(self) -> np.ndarray:
        """(C, K) log-weights of clips per category (-inf off-category)."""
        C = len(self.categories)
        K = self.num_clips
        logits = np.full((C, K), -1e9, np.float32)
        for c in range(C):
            m = self.label == c
            if m.any():
                w = self.weights[m] / self.weights[m].sum()
                logits[c, m] = np.log(w)
        return logits

    def sample_frames(self, key, c_idx: jnp.ndarray, dt: float, disc_obs_len: int = 2) -> jnp.ndarray:
        """Sample (N, 49) interpolated full frames, clip chosen per env
        within its latent-c category by motion weight, time uniform
        (reference get_full_frame_batch :513 + traj_time_sample_batch :333)."""
        N = c_idx.shape[0]
        kc, kt = jax.random.split(key)
        logits = jnp.asarray(self._cat_logits())[c_idx]              # (N, K)
        clip = jax.random.categorical(kc, logits, axis=-1)           # (N,)
        lens = jnp.asarray(self.clip_len)[clip]
        durs = jnp.asarray(self.clip_dur)[clip]
        subst = dt * disc_obs_len + durs
        t = jnp.maximum(1e-7, (lens - subst) * jax.random.uniform(kt, (N,)))
        return self._frames_at(clip, t)

    def _frames_at(self, clip, t) -> jnp.ndarray:
        """Gather + interpolate frames at times t within clips (lerp + slerp
        on the root quaternion, reference blend_frame_pose :476-511)."""
        n = jnp.asarray(self.clip_frames, jnp.float32)[clip]
        lens = jnp.asarray(self.clip_len)[clip]
        start = jnp.asarray(self.clip_start)[clip]
        p = t / lens
        lo = jnp.floor(p * n).astype(jnp.int32)
        hi = jnp.ceil(p * n).astype(jnp.int32)
        nmax = jnp.asarray(self.clip_frames)[clip] - 1
        lo = jnp.clip(lo, 0, nmax)
        hi = jnp.clip(hi, 0, nmax)
        f0 = self.frames[start + lo]
        f1 = self.frames[start + hi]
        blend = (p * n - lo)[:, None]
        out = f0 + blend * (f1 - f0)
        q = qm.quat_standardize(qm.slerp(f0[:, ROOT_ROT], f1[:, ROOT_ROT], blend))
        return out.at[:, ROOT_ROT].set(q)

    def sample_transition_frames(self, key, n: int, dt: float, labeled: bool,
                                 disc_obs_len: int = 2):
        """Sample n expert transitions: (disc_obs_len, n, 49) frame stacks
        dt apart, plus (n,) labels (labeled side only)."""
        kc, kt = jax.random.split(key)
        if labeled:
            logits = jnp.log(jnp.asarray(self.weights, jnp.float32))
            clip = jax.random.categorical(kc, jnp.broadcast_to(logits, (n, self.num_clips)), axis=-1)
            lens = jnp.asarray(self.clip_len)[clip]
            durs = jnp.asarray(self.clip_dur)[clip]
            labels = jnp.asarray(self.label)[clip]
        else:
            clip = jnp.zeros((n,), jnp.int32)
            F2 = self.ulb_frames.shape[0]
            lens = jnp.full((n,), (F2 - 1) * self.ulb_dur)
            durs = jnp.full((n,), self.ulb_dur)
            labels = jnp.zeros((n,), jnp.int32)
        subst = dt * disc_obs_len + durs
        t0 = jnp.maximum(1e-7, (lens - subst) * jax.random.uniform(kt, (n,)))
        stacks = []
        for i in range(disc_obs_len):
            t = t0 + i * dt
            if labeled:
                stacks.append(self._frames_at(clip, t))
            else:
                stacks.append(self._ulb_frames_at(t))
        return jnp.stack(stacks), labels

    def _ulb_frames_at(self, t) -> jnp.ndarray:
        F2 = self.ulb_frames.shape[0]
        length = (F2 - 1) * self.ulb_dur
        p = jnp.clip(t / length, 0.0, 1.0)
        lo = jnp.clip(jnp.floor(p * F2).astype(jnp.int32), 0, F2 - 1)
        hi = jnp.clip(jnp.ceil(p * F2).astype(jnp.int32), 0, F2 - 1)
        f0 = self.ulb_frames[lo]
        f1 = self.ulb_frames[hi]
        blend = (p * F2 - lo)[:, None]
        out = f0 + blend * (f1 - f0)
        q = qm.quat_standardize(qm.slerp(f0[:, ROOT_ROT], f1[:, ROOT_ROT], blend))
        return out.at[:, ROOT_ROT].set(q)


def disc_obs_from_frames(frames: jnp.ndarray, default_dof_pos, obs_scales) -> jnp.ndarray:
    """49-d discriminator features from full frames — identical formula to
    the env's disc observation (legged_robot.py:274-279; expert side:
    motion_loader.py:205-225).  Foot contact is inferred from toe height
    < 0.025 m."""
    q = frames[:, ROOT_ROT]
    roll, pitch, _ = qm.euler_from_quat(q)
    root_h = frames[:, 2:3]
    # clip velocities are stored world-frame; the reference rotates them
    # into the BASE frame before building expert features
    # (motion_loader.py:210-212 quat_rotate_inverse), matching the policy
    # side's base-frame velocities (legged_robot.py:137-141).  Feeding
    # world-frame expert velocities makes expert/policy trivially
    # separable: disc accuracy pins at ~1.0 and the style reward dies
    # (observed round 4: rollout/r_i 0.015 -> 0.0004 by 10k iterations).
    lin = qm.quat_rotate_inverse(q, frames[:, LIN_VEL]) * obs_scales.lin_vel_dist
    ang = qm.quat_rotate_inverse(q, frames[:, ANG_VEL]) * obs_scales.ang_vel_dist
    jp = (frames[:, JOINT_POS] - default_dof_pos) * obs_scales.dof_pos
    jv = frames[:, JOINT_VEL] * obs_scales.dof_vel
    toes = frames[:, TOE_POS].reshape(-1, 4, 3)
    hq = qm.heading_quat_inv(q)
    local = qm.quat_rotate(hq[:, None, :], toes - frames[:, None, 0:3])
    key_pos = local.reshape(-1, 12) * obs_scales.key_pos
    contact = (toes[:, :, 2] < 0.025).astype(frames.dtype) * obs_scales.foot_contact
    return jnp.concatenate(
        [jnp.stack([roll, pitch], -1), root_h, lin, ang, jp, jv, key_pos, contact], axis=-1
    )


# ---------------------------------------------------------------------------
# loading
# ---------------------------------------------------------------------------


def load_dir(lb_dir: str, ulb_dir: Optional[str], categories: Sequence[str]) -> MotionData:
    """Load mocap JSON clips ({FrameDuration, MotionWeight, Frames[(n,61)]})
    from a labeled dir (clip category from filename) and an optional
    unlabeled dir."""
    clips, labels, weights, durs = [], [], [], []
    for path in sorted(glob.glob(os.path.join(lb_dir, "*"))):
        name = os.path.basename(path)
        label = next((i for i, c in enumerate(categories) if c in name), None)
        if label is None:
            raise ValueError(f"no category of {categories} in {name}")
        with open(path) as f:
            d = json.load(f)
        clips.append(_reorder_pb_to_fk(np.asarray(d["Frames"], np.float64)[:, :FRAME_DIM]))
        labels.append(label)
        weights.append(float(d["MotionWeight"]))
        durs.append(float(d["FrameDuration"]))
    ulb = []
    ulb_dur = durs[0]
    if ulb_dir:
        for path in sorted(glob.glob(os.path.join(ulb_dir, "*"))):
            with open(path) as f:
                d = json.load(f)
            ulb.append(_reorder_pb_to_fk(np.asarray(d["Frames"], np.float64)[:, :FRAME_DIM]))
            ulb_dur = float(d["FrameDuration"])
    return _build(clips, labels, weights, durs, ulb, ulb_dur, categories)


def _build(clips, labels, weights, durs, ulb, ulb_dur, categories) -> MotionData:
    starts, nframes = [], []
    ofs = 0
    for c in clips:
        starts.append(ofs)
        nframes.append(len(c))
        ofs += len(c)
    frames = np.concatenate(clips).astype(np.float32)
    w = np.asarray(weights, np.float64)
    ulb_frames = np.concatenate(ulb).astype(np.float32) if ulb else frames.copy()
    return MotionData(
        categories=tuple(categories),
        frames=jnp.asarray(frames),
        clip_start=np.asarray(starts, np.int32),
        clip_frames=np.asarray(nframes, np.int32),
        clip_dur=np.asarray(durs, np.float32),
        clip_len=((np.asarray(nframes) - 1) * np.asarray(durs)).astype(np.float32),
        weights=(w / w.sum()).astype(np.float32),
        label=np.asarray(labels, np.int32),
        ulb_frames=jnp.asarray(ulb_frames),
        ulb_dur=float(ulb_dur),
    )


# ---------------------------------------------------------------------------
# synthetic gaits (self-contained fallback / test data)
# ---------------------------------------------------------------------------

_GAIT_PHASES = {
    # per-leg phase offsets [FL, FR, RL, RR] (fractions of a cycle)
    "walk": (0.0, 0.5, 0.75, 0.25),
    "pace": (0.0, 0.5, 0.0, 0.5),
    "trot": (0.0, 0.5, 0.5, 0.0),
    "canter": (0.0, 0.3, 0.6, 0.7),
    "jump": (0.0, 0.0, 0.0, 0.0),
}
_GAIT_FREQ = {"walk": 1.2, "pace": 1.8, "trot": 2.0, "canter": 2.4, "jump": 1.2}
_GAIT_SPEED = {"walk": 0.4, "pace": 1.0, "trot": 1.0, "canter": 1.6, "jump": 1.2}


def synthetic(model, categories: Sequence[str], n_frames: int = 120, frame_dur: float = 1 / 30.0,
              clips_per_cat: int = 2, seed: int = 0,
              active: Optional[Sequence[str]] = None) -> MotionData:
    """Procedural CPG gait clips with FK-consistent toe positions — lets the
    full SSInfoGAIL pipeline run without the external mocap dataset."""
    from agility_tpu.physics import kinematics as kin
    from agility_tpu.physics.constants import ModelConsts

    mc = ModelConsts.from_model(model)
    rng = np.random.default_rng(seed)
    default = np.asarray(model.default_dof_pos)
    clips, labels, weights, durs = [], [], [], []
    t = np.arange(n_frames) * frame_dur
    feet_links = np.asarray([model.link_names.index(f"{l}_calf") for l in ("FL", "FR", "RL", "RR")])

    fk_batch = jax.jit(jax.vmap(lambda bp, bq, qj: kin.fk(mc, bp, bq, qj).pos))

    active = set(active) if active is not None else set(categories)
    for label, cat in enumerate(categories):
        if cat not in active:
            continue
        for k in range(clips_per_cat):
            f = _GAIT_FREQ[cat] * (1.0 + 0.1 * rng.standard_normal())
            amp = 0.35 + 0.1 * rng.random()
            speed = _GAIT_SPEED[cat] * (1.0 + 0.15 * rng.standard_normal())
            phases = _GAIT_PHASES[cat]
            jp = np.tile(default, (n_frames, 1))
            for leg in range(4):
                ph = 2 * np.pi * (f * t + phases[leg])
                jp[:, 3 * leg + 1] += amp * 0.5 * np.sin(ph)            # thigh
                jp[:, 3 * leg + 2] += amp * np.clip(np.sin(ph), 0, 1)   # calf swing
            z0 = 0.30 + (0.06 * np.maximum(np.sin(2 * np.pi * f * t), 0) if cat == "jump" else 0.0)
            root_pos = np.stack([speed * t, np.zeros_like(t), z0 * np.ones_like(t) if np.isscalar(z0) else z0], -1)
            quat = np.tile([0.0, 0.0, 0.0, 1.0], (n_frames, 1))
            # FK toe positions
            pos = np.asarray(fk_batch(jnp.asarray(root_pos, jnp.float32),
                                      jnp.asarray(quat, jnp.float32),
                                      jnp.asarray(jp, jnp.float32)))
            toe = pos[:, feet_links] + np.array([0.0, 0.0, -0.213])  # foot frame offset
            toe[:, :, 2] -= toe[:, :, 2].min(axis=0, keepdims=True)
            jv = np.gradient(jp, frame_dur, axis=0)
            lin = np.gradient(root_pos, frame_dur, axis=0)           # world == local (yaw 0)
            ang = np.zeros_like(lin)
            frames = np.concatenate([root_pos, quat, jp, toe.reshape(n_frames, 12), lin, ang, jv], axis=-1)
            clips.append(frames)
            labels.append(label)
            weights.append(1.0)
            durs.append(frame_dur)
    return _build(clips, labels, weights, durs, [], frame_dur, categories)
