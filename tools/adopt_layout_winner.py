"""Adopt the winning layout_ab arm as the framework's tuned XLA options.

Reads layout_ab's JSON lines (from its log or stdin), picks the fastest
arm that (a) beat base by at least ``--min_gain`` and (b) produced the
same training loss (identical program semantics — compiler flags must not
change numerics beyond reduction-order noise), then writes
``ctgan_tpu/core/tuned_xla_flags.json`` so every app/bench jit picks the
flags up (core/compileopts.py).

    python tools/adopt_layout_winner.py --log runs/queue_r4.log [--apply]
    python tools/adopt_layout_winner.py --log ... --apply \
        --confirm runs/hlo_resnet_tuned_r4.txt.gz   # re-dump HLO on chip and
                                                    # report layout-copy bytes

Without --apply it only reports the decision (dry run).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

TUNED = os.path.join(os.path.dirname(__file__), "..",
                     "ctgan_tpu", "core", "tuned_xla_flags.json")


def parse_results(lines):
    out = []
    for line in lines:
        line = line.strip()
        if not (line.startswith("{") and '"arm"' in line):
            continue
        try:
            r = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "arm" in r:
            out.append(r)
    # keep the LAST result per arm label (reruns supersede)
    dedup = {}
    for r in out:
        dedup[r["arm"]] = r
    return dedup


def pick_winner(results, min_gain=0.02, loss_rtol=5e-3):
    base = results.get("base")
    if base is None or "sec_per_iter" not in base:
        return None, "no base measurement"
    ok = []
    for label, r in results.items():
        if label == "base" or "error" in r or "sec_per_iter" not in r:
            continue
        if not r.get("options"):
            continue
        gain = 1.0 - r["sec_per_iter"] / base["sec_per_iter"]
        loss_dev = abs(r["disc_cost"] - base["disc_cost"]) / max(
            abs(base["disc_cost"]), 1e-6)
        if gain >= min_gain and loss_dev <= loss_rtol:
            ok.append((gain, label, r))
        elif gain >= min_gain:
            print(f"  reject {label}: {gain*100:.1f}% faster but disc_cost "
                  f"deviates {loss_dev:.2e} (> {loss_rtol:.0e})")
    if not ok:
        return None, f"no arm beat base by >= {min_gain*100:.0f}% with matching loss"
    ok.sort(key=lambda t: (t[0], t[1]), reverse=True)
    gain, label, r = ok[0]
    return (label, r, gain), None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default="runs/queue_r4.log",
                    help="file holding layout_ab JSON lines ('-' = stdin)")
    ap.add_argument("--min_gain", type=float, default=0.02)
    ap.add_argument("--loss_rtol", type=float, default=5e-3)
    ap.add_argument("--apply", action="store_true",
                    help="write ctgan_tpu/core/tuned_xla_flags.json")
    ap.add_argument("--confirm", default=None,
                    help="after --apply, re-run hlo_breakdown with the "
                         "winning options, dumping HLO to this path "
                         "(reports whether layout-copy bytes fell)")
    args = ap.parse_args()

    if args.log == "-":
        lines = sys.stdin.readlines()
    else:
        # comma-separated list: later files' arms supersede earlier ones
        # in the label-keyed dedup below
        lines = []
        for path in args.log.split(","):
            with open(path) as f:
                lines += f.readlines()
    results = parse_results(lines)
    print(f"parsed {len(results)} arms from {args.log}")
    win, why = pick_winner(results, args.min_gain, args.loss_rtol)
    if win is None:
        print(f"no winner: {why}")
        return
    label, r, gain = win
    print(f"winner: {label}  ({gain*100:.1f}% faster than base, "
          f"{r['sec_per_iter']*1e3:.2f} ms/iter)  options={r['options']}")
    if not args.apply:
        print("dry run (pass --apply to adopt)")
        return
    path = os.path.abspath(TUNED)
    with open(path, "w") as f:
        json.dump({"tpu": r["options"],
                   "provenance": {"arm": label, "gain": round(gain, 4),
                                  "sec_per_iter": r["sec_per_iter"],
                                  "source": args.log}}, f, indent=1)
    print(f"wrote {path}")
    if args.confirm:
        opts = ",".join(f"{k}={v}" for k, v in r["options"].items())
        subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__),
                                          "hlo_breakdown.py"),
             "--workload", "resnet", "--top", "10",
             "--options", opts, "--dump", args.confirm],
            check=False,
        )


if __name__ == "__main__":
    main()
