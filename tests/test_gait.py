"""Gait-statistics comparator tests (behavior-parity harness, io/gait.py).

Validates the harness mechanics on analytically-known contact signals and
self-consistency against the synthetic mocap generator — the north-star
proxy of BASELINE.md (match the reference's gait behavior within tolerance,
bands derived from the mocap clips themselves)."""
import os

import numpy as np
import pytest

from agility_tpu.io import gait


def square_gait(phases, duty, freq_hz, T=600, dt=0.02):
    """(T, 4) stance flags for a periodic gait with per-leg phase offsets."""
    t = np.arange(T) * dt
    c = np.stack([((freq_hz * t + ph) % 1.0) < duty for ph in phases], -1)
    return c


def test_trot_stats():
    # trot: diagonal pairs in phase, duty 0.5, 2 Hz
    c = square_gait((0.0, 0.5, 0.5, 0.0), duty=0.5, freq_hz=2.0)
    s = gait.gait_stats(c, dt=0.02)
    np.testing.assert_allclose(s["duty"], 0.5, atol=0.02)
    np.testing.assert_allclose(s["stride_hz"], 2.0, atol=0.1)
    assert s["diag_sync"] > 0.95          # FL-RR / FR-RL together
    assert s["front_sync"] < 0.05         # FL-FR anti-phase


def test_walk_stats():
    # 4-beat walk: duty 0.75, 1.2 Hz, no foot pair fully in phase
    c = square_gait((0.0, 0.5, 0.75, 0.25), duty=0.75, freq_hz=1.2)
    s = gait.gait_stats(c, dt=0.02)
    np.testing.assert_allclose(s["duty"], 0.75, atol=0.02)
    np.testing.assert_allclose(s["stride_hz"], 1.2, atol=0.1)
    assert 0.4 < s["diag_sync"] < 0.9


def test_multi_env_average():
    c1 = square_gait((0.0, 0.5, 0.5, 0.0), 0.5, 2.0)
    c = np.stack([c1, c1], axis=1)        # (T, 2, 4)
    s = gait.gait_stats(c, dt=0.02)
    np.testing.assert_allclose(s["duty"], 0.5, atol=0.02)


def test_compare_bands():
    c = square_gait((0.0, 0.5, 0.5, 0.0), 0.5, 2.0)
    s = gait.gait_stats(c, dt=0.02)
    ok = gait.compare(s, {"duty": (0.4, 0.6), "stride_hz": (1.5, 2.5)})
    assert ok["ok"]
    bad = gait.compare(s, {"duty": (0.6, 0.8), "stride_hz": (1.5, 2.5)})
    assert not bad["ok"] and not bad["duty"] and bad["stride_hz"]
    print(gait.format_report(s, {"duty": (0.4, 0.6)}, ok))


def test_bands_from_synthetic_motion():
    """Self-consistency: each synthetic mocap clip's gait stats fall inside
    the bands derived from its own mode's clips."""
    from agility_tpu.core.urdf import build_go2_model
    from agility_tpu.envs import mocap

    model = build_go2_model()
    motion = mocap.synthetic(model, ("walk", "trot"), n_frames=150,
                             clips_per_cat=2, seed=3)
    frames = np.asarray(motion.frames)
    for mode_idx in (0, 1):
        bands = gait.bands_from_motion(motion, mode_idx)
        assert set(bands) == {"duty", "stride_hz", "diag_sync"}
        for s0, n, lab in zip(motion.clip_start, motion.clip_frames, motion.label):
            if lab != mode_idx:
                continue
            clip = frames[s0:s0 + n]
            stats = gait.stats_from_toe_heights(
                gait.clip_toe_heights(clip), float(motion.clip_dur[lab]))
            assert gait.compare(stats, bands)["ok"]
    # and no bands for a mode with no clips
    assert gait.bands_from_motion(motion, 4) == {}


REAL_MOCAP = "/root/reference/bbc/mocap_data/mocap_all_lb"


@pytest.mark.skipif(not os.path.isdir(REAL_MOCAP),
                    reason="reference mocap dataset not present")
def test_real_clip_bands_match_committed_artifact():
    """Bands derived from the 17 REAL labeled clips (the BASELINE north
    star's target definition) must match the committed artifact
    agility_tpu/assets/gait_bands_real.json (tools/make_gait_bands.py) —
    a stale artifact fails here instead of silently mis-gating policies."""
    import json

    from agility_tpu.envs.config import MOCAP_CATEGORIES
    from agility_tpu.envs import mocap

    motion = mocap.load_dir(REAL_MOCAP, None, MOCAP_CATEGORIES)
    assert motion.num_clips == 17
    art_path = os.path.join(os.path.dirname(__file__), "..",
                            "agility_tpu", "assets", "gait_bands_real.json")
    with open(art_path) as f:
        artifact = json.load(f)
    for mi, mode in enumerate(MOCAP_CATEGORIES):
        bands = gait.bands_from_motion(motion, mi)
        assert bands, f"no {mode} clips"
        stored = artifact[mode]
        assert stored["clips"] == int((motion.label == mi).sum())
        for key, (lo, hi) in bands.items():
            s_lo, s_hi = stored[key]
            assert lo < hi and np.isfinite([lo, hi]).all()
            np.testing.assert_allclose([lo, hi], [s_lo, s_hi], atol=1e-6,
                                       err_msg=f"{mode}/{key} artifact stale")
