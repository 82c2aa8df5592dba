"""Text summary of a training run's TensorBoard event file.

Prints first/quartile/last values per scalar tag (optionally filtered) —
the evidence artifact generator for PARITY.md's trained-behavior section.

  python tools/report_run.py logs/bbc_r4/0 [--tags rollout/ disc/acc] [--points 8]
"""
import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("logdir")
    p.add_argument("--tags", nargs="*", default=None,
                   help="tag prefixes to include (default: all)")
    p.add_argument("--points", type=int, default=8)
    args = p.parse_args()

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    ea = EventAccumulator(args.logdir)
    ea.Reload()
    tags = sorted(ea.Tags()["scalars"])
    if args.tags:
        tags = [t for t in tags if any(t.startswith(p) for p in args.tags)]
    if not tags:
        print(f"no scalar tags in {args.logdir}", file=sys.stderr)
        sys.exit(1)
    for t in tags:
        ev = ea.Scalars(t)
        if len(ev) < 2:
            continue
        stride = max(len(ev) // args.points, 1)
        picked = ev[::stride]
        if picked[-1].step != ev[-1].step:
            picked = picked + [ev[-1]]
        line = " ".join(f"{e.value:+.4g}@{e.step}" for e in picked)
        print(f"{t:32s} {line}")


if __name__ == "__main__":
    main()
