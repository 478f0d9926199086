"""Flagship layout/copy-flag A/B: measured step-time sweep of XLA-TPU
layout flags.

Historical note: this sweep was motivated by a round-3 HLO attribution
claiming 16.7% of flagship traffic was layout-change copies; that figure
was a parser artifact (the copy-start/done pairs are same-layout
HBM<->VMEM prefetches — VALIDATION.md "Copy attribution corrected";
genuine layout-change copies are ~0.35 GB/iter).  The sweep remains
justified by its *measured* results — `layout_hints_off` is a real,
bit-exact −8.0% (adopted) — the flags influence fusion/scheduling
choices beyond just copies.  libtpu ships several layout/copy flags
(enumerated from the installed libtpu.so) that
`jax.jit(compiler_options=...)` can flip per-program.

This tool compiles the SAME flagship scan program (identical to
bench_all's methodology: K iterations inside one jitted lax.scan,
two window sizes, difference cancels dispatch overhead) under each flag
arm and prints one JSON line per arm.  Arms whose flag name/value the
compiler rejects are reported with "error" instead of aborting the
sweep.

    python tools/layout_ab.py [--iters 10] [--arms base,negotiation,...]

Reference context: the TF-1.2 baseline had no analogue — layout was
fixed NCHW end-to-end (`tflib/ops/conv2d.py:106-112`); on TPU the
compiler owns layout, so this sweep is the TPU-native version of that
design decision.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

ARMS = {
    "base": None,
    "negotiation": {"xla_tpu_allow_layout_negotiation": "true"},
    "autotune": {"xla_tpu_autotune_layouts": "true"},
    "loop_fusion_layout": {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"},
    "copy_permute_fusion": {"xla_tpu_enable_copy_permute_minor_fusion": "true"},
    "layout_hints_off": {"xla_tpu_enable_layout_hints": "false"},
    "policy_auto": {"xla_tpu_layout_preference_policy": "auto"},
    "policy_latch": {"xla_tpu_layout_preference_policy": "latch"},
    "copy_fusion": {"xla_tpu_enable_copy_fusion": "true"},
    # Second wave (enumerated from libtpu.so, round 4): fusion-time layout
    # updates, the large-2nd-minor family (the observed copy target layout
    # {3,0,2,1:T(8,128)(2,1)} differs from the source in its 2nd-minor
    # ordering), copy-elision budget, and dot/layout ordering policies.
    "fusion_layout_update": {"xla_tpu_enable_fusion_layout_update": "true"},
    "large_2nd_minor": {"xla_tpu_enable_large_2nd_minor_layout": "true"},
    "untiled_layout": {"xla_tpu_enable_untiled_layout": "true"},
    "reverse_layout_order": {"xla_tpu_reverse_layout_computation_order": "true"},
    "dot_grouping": {"xla_tpu_layout_use_dot_grouping": "true"},
    "dot_after_layout": {"xla_tpu_order_dot_after_layout": "true"},
    "latch_rhs": {"xla_tpu_prefer_latch_optimized_rhs_layouts": "true"},
    "copy_fusion_split": {"xla_tpu_enable_copy_fusion": "true",
                          "xla_tpu_copy_fusion_allow_split": "true"},
    "copy_elision_budget": {"xla_tpu_copy_elision_analysis_allowance": "100000"},
    # Model-level arm (no compiler flags): trace every 2-D conv under NCHW
    # logical order (core/matmul.conv_dim_order) so layout assignment
    # negotiates over a different operand order.  Marked by the sentinel —
    # adopt_layout_winner skips it (options=None in the result); adopting a
    # win here is the CTGAN_CONV_DIM_ORDER=NCHW env knob instead.
    "nchw_hint": "MODEL:NCHW",
    # Stacked arms: the round-4 sweep adopted layout_hints_off (-8.0%,
    # bit-exact) and measured five further loss-matching -1.3..-2.1%
    # improvers BEFORE the winner was adopted; whether any of them still
    # pays ON TOP of the adopted flag is a separate measurement (flags are
    # independent compiler passes; gains often overlap).  Each stacked arm
    # = the committed winner + one candidate; "h_all5" merges all five.
    "h_negotiation": {"xla_tpu_enable_layout_hints": "false",
                      "xla_tpu_allow_layout_negotiation": "true"},
    "h_autotune": {"xla_tpu_enable_layout_hints": "false",
                   "xla_tpu_autotune_layouts": "true"},
    "h_copy_permute": {"xla_tpu_enable_layout_hints": "false",
                       "xla_tpu_enable_copy_permute_minor_fusion": "true"},
    "h_copy_fusion": {"xla_tpu_enable_layout_hints": "false",
                      "xla_tpu_enable_copy_fusion": "true"},
    "h_untiled": {"xla_tpu_enable_layout_hints": "false",
                  "xla_tpu_enable_untiled_layout": "true"},
    "h_all5": {"xla_tpu_enable_layout_hints": "false",
               "xla_tpu_allow_layout_negotiation": "true",
               "xla_tpu_autotune_layouts": "true",
               "xla_tpu_enable_copy_permute_minor_fusion": "true",
               "xla_tpu_enable_copy_fusion": "true",
               "xla_tpu_enable_untiled_layout": "true"},
    # The one combo VERDICT r3 Weak #4 singles out: the two best solo arms
    # (~23.8-23.9 ms each on the unfused program) stacked.
    "h_copy_elision": {"xla_tpu_enable_layout_hints": "false",
                       "xla_tpu_copy_elision_analysis_allowance": "100000"},
}


def measure(w, iters, options, label):
    import jax
    import jax.numpy as jnp

    state = w.init_state()
    batch = w.make_batch(0)
    key = jax.random.PRNGKey(0)

    def multi(state, batch, key, k):
        def body(carry, _):
            carry, m = w.step_fn(carry, *batch, key)
            return carry, m["disc_cost"]

        return jax.lax.scan(body, state, jnp.arange(k))

    jit_multi = jax.jit(multi, static_argnums=3, donate_argnums=0,
                        compiler_options=options)
    k1, k2 = max(2, iters // 2), iters * 2
    t0 = time.perf_counter()
    try:
        state, costs = jit_multi(state, batch, key, k1)
        float(costs[-1])
    except Exception as e:  # rejected flag, compile failure — keep sweeping
        print(json.dumps({"arm": label, "error": str(e)[:300]}), flush=True)
        return None
    state, costs = jit_multi(state, batch, key, k2)
    float(costs[-1])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, costs = jit_multi(state, batch, key, k1)
    float(costs[-1])
    t_k1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, costs = jit_multi(state, batch, key, k2)
    final_cost = float(costs[-1])
    t_k2 = time.perf_counter() - t0
    sec = (t_k2 - t_k1) / (k2 - k1)
    result = {
        "arm": label,
        "options": options,
        "sec_per_iter": round(sec, 5),
        "images_per_sec": round(w.batch_size * w.critic_iters / sec, 1),
        "compile_sec": round(compile_s, 1),
        "disc_cost": final_cost,
    }
    print(json.dumps(result), flush=True)
    return result


def combo_candidates(results, min_gain=0.01, loss_rtol=5e-3):
    """Arms worth merging into the combo measurement.

    Only flag arms that beat base by ``min_gain`` AND reproduced base's
    disc_cost qualify: an arm that changed numerics would make the whole
    combo unadoptable under adopt_layout_winner's matching-loss gate
    (``loss_rtol`` kept in sync with ``pick_winner``), wasting the slot.
    """
    base = results.get("base")
    if base is None or "sec_per_iter" not in base:
        return {}
    return {
        k: v for k, v in results.items()
        if v.get("options") and "sec_per_iter" in v
        and v["sec_per_iter"] < base["sec_per_iter"] * (1.0 - min_gain)
        and abs(v["disc_cost"] - base["disc_cost"])
        <= loss_rtol * max(abs(base["disc_cost"]), 1e-6)
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--arms", default=",".join(ARMS))
    ap.add_argument("--combo_from", default=None,
                    help="path to a prior sweep's log: skip the per-arm "
                    "sweep and measure only base + the merged combo of that "
                    "log's loss-matching >1%% improvers (2 compiles instead "
                    "of a full re-sweep)")
    ap.add_argument("--workload", default="resnet")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the sitecustomize-registered "
                    "axon backend ignores JAX_PLATFORMS, so this must flip "
                    "jax.config before backend init)")
    args = ap.parse_args()

    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    import jax

    from ctgan_tpu.core import default_tpu_policy

    on_tpu = jax.devices()[0].platform != "cpu"
    default_tpu_policy(enable_bf16=on_tpu)
    if on_tpu:
        from ctgan_tpu.ops.dropout import enable_pallas_dropout

        enable_pallas_dropout(True)

    from workloads import build_workload

    w = build_workload(args.workload, tiny=args.tiny)

    if args.combo_from:
        from adopt_layout_winner import parse_results

        prior = parse_results(open(args.combo_from).readlines())
        improvers = combo_candidates(prior)
        if len(improvers) < 2:
            print(json.dumps({"arm": "combo", "error":
                              f"only {len(improvers)} loss-matching improvers "
                              f"in {args.combo_from} — nothing to merge"}),
                  flush=True)
            return
        merged = {}
        for v in improvers.values():
            merged.update(v["options"])
        measure(w, args.iters, None, "base")
        measure(w, args.iters, merged,
                "combo(" + "+".join(sorted(improvers)) + ")")
        return

    results = {}
    for label in args.arms.split(","):
        if label not in ARMS:
            print(json.dumps({"arm": label, "error": "unknown arm"}), flush=True)
            continue
        arm = ARMS[label]
        if isinstance(arm, str) and arm.startswith("MODEL:"):
            from ctgan_tpu.core import matmul

            matmul.conv_dim_order(arm.split(":", 1)[1])
            try:
                r = measure(w, args.iters, None, label)
            finally:
                matmul.conv_dim_order("NHWC")
        else:
            r = measure(w, args.iters, arm, label)
        if r is not None:
            results[label] = r

    # Combo pass: merge every arm that beat base by >1% and measure the
    # union (flags are independent compiler passes; the union frequently
    # compounds, but can also regress — hence measured, not assumed).
    improvers = combo_candidates(results)
    if len(improvers) >= 2:
        merged = {}
        for v in improvers.values():
            merged.update(v["options"])
        measure(w, args.iters, merged,
                "combo(" + "+".join(sorted(improvers)) + ")")


if __name__ == "__main__":
    main()
