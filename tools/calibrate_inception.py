"""Calibrate the file-based Inception-2015 executor against a real graph.

VERDICT r2 #5b: the JAX GraphDef executor (`ctgan_tpu/eval/inception2015.py`)
has only ever run hand-built mini graphs in this environment (zero egress).
This harness makes the FIRST run against the real
``classify_image_graph_def.pb`` / ``inception-2015-12-05.tgz`` a config
change, not a debugging session:

  1. **Static op census** — walks the exact execution frontier
     (pool_3 reachable from the ExpandDims feed) and reports any op outside
     ``SUPPORTED_OPS`` BEFORE executing, so coverage gaps surface as a named
     list, not a mid-eval crash.
  2. **Protocol shape check** — runs one small batch and asserts the
     reference protocol invariants: pool_3 -> [B, 2048] features, no-bias
     MatMul -> [B, 1008] softmax rows summing to 1
     (tflib/inception_score.py:78-94).
  3. **Score pass** — scores real CIFAR-10 test images when ``--data_dir``
     has the pickle batches (tflib/cifar10.py:8-12), else synthetic, and
     prints comparability vs the reference's committed IS=5.13/5.20
     sample artifacts (the real CIFAR-10 *test set* scores ~11.2 under this
     graph per the literature; generated 1000-example CT-GAN samples score
     ~5.1-5.2).

Usage:
    python tools/calibrate_inception.py [--pb PATH] [--data_dir DIR]
                                        [--n 10000] [--batch 100]

Exit status 0 = executor fully covers the graph and the protocol checks
pass; 2 = op-coverage gaps (report printed, nothing executed).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pb", default=None,
                    help=".pb or .tgz (default: $CTGAN_INCEPTION_PB / /tmp/imagenet)")
    ap.add_argument("--data_dir", default=os.environ.get("DATA_DIR", ""),
                    help="CIFAR-10 pickle-batch dir for the real-data score pass")
    ap.add_argument("--n", type=int, default=10000, help="images to score")
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--splits", type=int, default=10)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the env's sitecustomize "
                    "registers the axon TPU backend in every process; the "
                    "JAX_PLATFORMS env var alone does not override it)")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ctgan_tpu.eval.inception2015 import Inception2015, SUPPORTED_OPS

    inc = Inception2015(args.pb, batch_size=args.batch)
    exe = inc.exe
    print(f"[calibrate] graph loaded: {len(exe.nodes)} nodes, "
          f"{len(exe.consts)} consts")

    # ---- 1. static op census over the exact execution frontier
    frontier = exe.reachable(inc.POOL, feeds=(inc.FEED,))
    ops_used = sorted({n.op for n in frontier})
    gaps = exe.unsupported(inc.POOL, feeds=(inc.FEED,))
    print(f"[calibrate] execution frontier: {len(frontier)} nodes, "
          f"{len(ops_used)} distinct ops")
    print(f"[calibrate] ops used: {', '.join(ops_used)}")
    if gaps:
        print("[calibrate] UNSUPPORTED OPS — implement these in "
              "ctgan_tpu/eval/inception2015.py::_Executor before scoring:")
        for op, names in sorted(gaps.items()):
            print(f"  {op}: {len(names)} node(s), e.g. {names[:3]}")
        return 2
    print(f"[calibrate] op coverage OK ({len(SUPPORTED_OPS)} ops supported)")

    # ---- 2. protocol shape check on one small batch
    rng = np.random.default_rng(0)
    probe = rng.uniform(0, 255, size=(4, 32, 32, 3)).astype(np.float32)
    t0 = time.time()
    feats, preds = inc.predictions(probe)
    print(f"[calibrate] probe batch executed in {time.time() - t0:.1f}s")
    assert feats.ndim == 2 and feats.shape[0] == 4, feats.shape
    assert preds.shape[0] == 4, preds.shape
    np.testing.assert_allclose(preds.sum(axis=1), 1.0, atol=1e-4)
    print(f"[calibrate] pool_3 features: [B, {feats.shape[1]}] "
          f"(reference: 2048); softmax: [B, {preds.shape[1]}] "
          f"(reference: 1008); rows sum to 1 OK")
    shapes_match = feats.shape[1] == 2048 and preds.shape[1] == 1008
    if not shapes_match:
        print("[calibrate] WARNING: shapes differ from the 2015 graph — "
              "scores will not be reference-comparable")

    # ---- 3. score pass: real CIFAR test set if available, else synthetic
    src = "synthetic"
    if args.data_dir and os.path.exists(
            os.path.join(args.data_dir, "test_batch")):
        from ctgan_tpu.data import cifar10

        d = cifar10.load_arrays(args.data_dir)
        imgs = d["test"][0][: args.n].reshape(-1, 3, 32, 32).astype(np.float32)
        src = f"cifar10 test_batch ({len(imgs)} images)"
    else:
        imgs = rng.uniform(0, 255, size=(min(args.n, 1000), 3, 32, 32)
                           ).astype(np.float32)
    t0 = time.time()
    mean, std = inc.inception_score(imgs, splits=args.splits)
    dt = time.time() - t0
    print(f"[calibrate] IS over {src}: {mean:.3f} +/- {std:.3f} "
          f"({len(imgs)} images in {dt:.1f}s, "
          f"{len(imgs) / dt:.0f} img/s)")
    if src != "synthetic" and shapes_match:
        lo, hi = 10.5, 12.0  # published real-test-set IS band for this graph
        verdict = "COMPARABLE" if lo <= mean <= hi else "OUT OF BAND"
        print(f"[calibrate] real CIFAR-10 test-set IS expected in "
              f"[{lo}, {hi}] for the 2015 graph: {verdict}")
        print("[calibrate] generated-sample baseline: the reference's "
              "1000-example CT-GAN artifacts score IS=5.13 (M=0.0) / "
              "5.20 (M=0.1) under this protocol")
    print(json.dumps({"nodes": len(exe.nodes), "ops": len(ops_used),
                      "gaps": sum(map(len, gaps.values())),
                      "pool_dim": int(feats.shape[1]),
                      "classes": int(preds.shape[1]),
                      "is_mean": float(mean), "is_std": float(std),
                      "source": src}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
