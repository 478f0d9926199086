"""Assemble the flagship at-schedule evidence from a run's log.ndjson.

Prints a markdown IS/FID-vs-iteration table plus summary stats, and copies
the latest sample grid + metric curves into docs/evidence/.

    python tools/evidence_flagship.py [--run runs/flagship_r2] [--every 5000]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="runs/flagship_r2")
    ap.add_argument("--is-key", default="inception_50k",
                    help="metric key holding the IS mean (good64 runs log 'inception score')")
    ap.add_argument("--fid-key", default="fid_10k")
    ap.add_argument("--every", type=int, default=5000)
    ap.add_argument("--copy-to", default="docs/evidence")
    args = ap.parse_args()

    recs = [json.loads(l) for l in open(os.path.join(args.run, "log.ndjson"))]
    K, F = args.is_key, args.fid_key
    is_recs = [r for r in recs if K in r]
    if not is_recs:
        print("no IS records yet")
        return

    print("| iteration | IS(50k) mean±std | FID(10k) | dev_cost | ct | gp |")
    print("|---|---|---|---|---|---|")
    shown = set()
    for r in is_recs:
        it = r["iteration"]
        bucket = it // args.every
        if bucket in shown and r is not is_recs[-1]:
            continue
        shown.add(bucket)
        print(
            f"| {it + 1} | {r[K]:.3f}±{r.get(K + '_std', 0):.3f} "
            f"| {r.get(F, float('nan')):.3f} | {r.get('dev_cost', float('nan')):.3f} "
            f"| {r.get('ct', float('nan')):.3f} | {r.get('gp', float('nan')):.4f} |"
        )
    best = max(is_recs, key=lambda r: r[K])
    last = is_recs[-1]
    print()
    print(f"best IS: {best[K]:.3f} at iter {best['iteration'] + 1}; "
          f"final IS: {last[K]:.3f} at iter {last['iteration'] + 1}; "
          f"{len(is_recs)} IS evaluations")

    if args.copy_to:
        os.makedirs(args.copy_to, exist_ok=True)
        grids = sorted(
            glob.glob(os.path.join(args.run, "samples_*.png")),
            key=lambda p: int(p.rsplit("_", 1)[1].split(".")[0]),
        )
        for pick in {0, len(grids) // 2, len(grids) - 1}:
            if 0 <= pick < len(grids):
                shutil.copy(grids[pick], args.copy_to)
        print(f"copied {min(3, len(grids))} sample grids to {args.copy_to}")


if __name__ == "__main__":
    main()
