"""Derive per-mode gait acceptance bands from the REAL labeled mocap clips.

The BASELINE north star is behavioral: a trained BBC should reproduce the
mocap gaits (duty factor, stride frequency, diagonal phase sync) within
tolerance.  The bands are defined by the expert data itself: for every
labeled clip (reference dataset `bbc/mocap_data/mocap_all_lb/`, 17 clips
across walk/pace/trot/canter/jump — reference loader
bbc/rsl_rl/datasets/motion_loader.py:304-341), compute gait stats from the
toe-height trace and take [min - tol, max + tol] over same-mode clips
(io/gait.bands_from_clips).

Writes the committed artifact `agility_tpu/assets/gait_bands_real.json`,
consumed by `play_bbc --gait_bands` and tests/test_gait.py.

  python tools/make_gait_bands.py --mocap_dir /root/reference/bbc/mocap_data
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from agility_tpu.envs.config import MOCAP_CATEGORIES
from agility_tpu.envs import mocap
from agility_tpu.io import gait


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mocap_dir", default="/root/reference/bbc/mocap_data")
    p.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "agility_tpu", "assets", "gait_bands_real.json"))
    args = p.parse_args()

    motion = mocap.load_dir(os.path.join(args.mocap_dir, "mocap_all_lb"),
                            None, MOCAP_CATEGORIES)
    out = {}
    for mi, mode in enumerate(MOCAP_CATEGORIES):
        bands = gait.bands_from_motion(motion, mi)
        n = int((motion.label == mi).sum())
        out[mode] = {"clips": n, **{k: list(v) for k, v in bands.items()}}
        print(f"{mode:>8} ({n} clips): " + "  ".join(
            f"{k}=[{lo:.3f},{hi:.3f}]" for k, (lo, hi) in bands.items()))
    with open(os.path.abspath(args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {os.path.abspath(args.out)}")


if __name__ == "__main__":
    main()
