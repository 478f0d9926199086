"""Measure the unfused (TP-safe) execution mode's dispatch overhead on
hardware (VERDICT r2 #6).

Tensor-parallel sharding must run the trainer unfused — one jit per critic
substep — because XLA's SPMD partitioner miscompiles chained grad+update
iterations in one program (docs/XLA_GSPMD_SCAN_BUG.md).  Round 2 proved
unfused numerics on a virtual CPU mesh but never measured the mode's
per-program dispatch cost on the real chip.  This tool times the flagship
iteration both ways on whatever backend is available (the single real chip:
model axis degenerate, dispatch structure identical to the TP case) and
reports per-dispatch overhead.

Both arms are timed with per-iteration host readback (the unfused mode
cannot use scan-window timing), so the comparison is apples-to-apples; the
fused arm's scan-window number from bench.py remains the throughput
headline.

    python tools/measure_tp.py [--iters 30] [--cpu] [--workload resnet]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")


def _time_arm(run, state, batch, key, iters):
    import jax

    state, m = run(state, *batch, key)          # compile
    jax.block_until_ready(m["disc_cost"])
    state, m = run(state, *batch, key)          # warm
    float(m["disc_cost"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = run(state, *batch, key)
        float(m["disc_cost"])                   # per-iter readback, both arms
    return (time.perf_counter() - t0) / iters, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--workload", default="resnet")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    import jax

    from ctgan_tpu.core import default_tpu_policy
    from ctgan_tpu.train.unfused import make_unfused_step
    from workloads import build_workload

    on_tpu = jax.devices()[0].platform != "cpu"
    default_tpu_policy(enable_bf16=on_tpu)
    if on_tpu:
        from ctgan_tpu.ops.dropout import enable_pallas_dropout

        enable_pallas_dropout(True)

    w = build_workload(args.workload, tiny=args.tiny)
    key = jax.random.PRNGKey(0)
    k = w.critic_iters

    # same tuned compiler options as the unfused arm's substeps (applied by
    # make_unfused_step) — otherwise the A/B mixes flag effects into the
    # dispatch-overhead difference once tuned_xla_flags.json exists
    from ctgan_tpu.core import tuned_compiler_options

    fused = jax.jit(w.step_fn, donate_argnums=0,
                    compiler_options=tuned_compiler_options())
    sec_fused, _ = _time_arm(fused, w.init_state(), w.make_batch(0), key, args.iters)

    unfused = make_unfused_step(w.step_fn, has_labels=args.workload == "resnet")
    sec_unfused, _ = _time_arm(
        unfused, w.init_state(), w.make_batch(0), key, args.iters
    )

    n_extra = k + 2 - 1  # dispatches beyond the fused arm's single launch
    out = {
        "workload": w.name,
        "device": str(jax.devices()[0]),
        "iters": args.iters,
        "critic_iters": k,
        "sec_per_iter_fused": round(sec_fused, 5),
        "sec_per_iter_unfused": round(sec_unfused, 5),
        "unfused_overhead_sec": round(sec_unfused - sec_fused, 5),
        "overhead_per_extra_dispatch_ms": round(
            1e3 * (sec_unfused - sec_fused) / n_extra, 3
        ),
        "unfused_slowdown_pct": round(100 * (sec_unfused / sec_fused - 1), 1),
        "note": "per-iter readback timing both arms; fused scan-window "
                "throughput lives in bench.py",
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
