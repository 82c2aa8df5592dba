"""One-shot build tool: distill the Go2 robot description from a URDF into
the packaged JSON model asset (agility_tpu/assets/go2_model.json).

Usage: python tools/extract_go2.py <path/to/go2.urdf>
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from agility_tpu.core.urdf import load_urdf, parsed_to_json  # noqa: E402


def main():
    urdf = sys.argv[1]
    parsed = load_urdf(urdf)
    out = os.path.join(os.path.dirname(__file__), "..", "agility_tpu", "assets", "go2_model.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(parsed_to_json(parsed), f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
