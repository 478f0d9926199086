"""Per-workload training throughput harness.

Measures every model family's fused train iteration (G update +
critic_iters D updates with CT+GP) and prints one JSON line per workload.
``bench.py`` stays the single-line flagship benchmark for the driver; this
tool gives the full performance picture.

    python tools/bench_all.py [--workloads mnist,cifar,resnet,good64,lsun128]
                              [--iters 10] [--tiny]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial

sys.path.insert(0, ".")


def _measure(name, init_state, step_fn, make_batch, batch_size, critic_iters, iters):
    """Scan-window-difference timing (see bench.py): K iterations inside one
    jitted lax.scan, two window sizes, difference cancels dispatch/readback
    overhead — the only methodology that survives this tunneled runtime
    (end-block under-waits on donated buffers; eager per-iter ops pay ~1.4s
    relay round trips)."""
    import jax
    import jax.numpy as jnp

    state = init_state()
    batch = make_batch(0)
    key = jax.random.PRNGKey(0)

    def multi(state, batch, key, k):
        def body(carry, _):
            carry, m = step_fn(carry, *batch, key)
            return carry, m["disc_cost"]

        return jax.lax.scan(body, state, jnp.arange(k))

    from ctgan_tpu.core import tuned_compiler_options

    jit_multi = jax.jit(multi, static_argnums=3, donate_argnums=0,
                        compiler_options=tuned_compiler_options())
    k1, k2 = max(2, iters // 2), iters * 2
    t0 = time.perf_counter()
    state, costs = jit_multi(state, batch, key, k1)
    float(costs[-1])
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
    print(json.dumps({
        "workload": name,
        "sec_per_iter": round(sec, 4),
        "images_per_sec": round(batch_size * critic_iters / sec, 1),
        "compile_sec": round(compile_s, 1),
        "disc_cost": final_cost,
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workloads", default="mnist,cifar,resnet,good64,lsun128")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tiny", action="store_true", help="tiny dims (CPU smoke)")
    ap.add_argument("--lsun_remat", default="both", choices=["on", "off", "both"])
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the TPU may be busy; the "
                    "sitecustomize-registered axon backend ignores "
                    "JAX_PLATFORMS, so this must flip jax.config before "
                    "backend init)")
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

    # A/B contract: base arms (mnist/cifar/resnet/good64/lsun128) measure
    # the UNFUSED mean-pool path, `*_mpf` arms force the fused one — pinned
    # explicitly here because the shipped default flipped to fused in r4
    # (blocks.FUSE_MEANPOOL_CONV) and inheriting it would compare fused vs
    # fused.
    from ctgan_tpu.models import blocks

    blocks.FUSE_MEANPOOL_CONV = False

    t = args.tiny
    wl = set(args.workloads.split(","))
    for which in ("mnist", "cifar", "resnet"):
        if which in wl:
            w = build_workload(which, tiny=t)
            _measure(w.name, w.init_state, w.step_fn, w.make_batch,
                     w.batch_size, w.critic_iters, args.iters)
    if "resnet_ab" in wl:
        # flagship HBM-byte-cut A/B (the step is at the HBM roofline, so
        # traffic reduction is the only speed lever): drop the kp=1
        # monitoring pass from the hot loop / remat the D forward.
        for label, ov in (
            ("_noclean", {"clean_pass": False}),
            ("_remat", {"remat": True}),
            ("_noclean_remat", {"clean_pass": False, "remat": True}),
            ("_bf16opt", {"opt_state_dtype": "bfloat16"}),
            ("_noclean_bf16opt", {"clean_pass": False,
                                  "opt_state_dtype": "bfloat16"}),
            # two batch-128 CT passes instead of one batch-256 pass: fewer
            # tensors in the 256-row layout domain where the HLO attribution
            # found the 201 MB layout-change copies (identical numerics —
            # per-example dropout makes the passes independent either way)
            ("_unfused_ct", {"fuse_ct_passes": False}),
        ):
            w = build_workload("resnet", tiny=t, **ov)
            _measure(w.name + label, w.init_state, w.step_fn, w.make_batch,
                     w.batch_size, w.critic_iters, args.iters)
    if "resnet_mpf" in wl:
        # fused conv+mean_pool stride-2 rewrite (blocks.FUSE_MEANPOOL_CONV):
        # one transformed-kernel conv instead of conv -> materialized
        # full-res activation -> reduce (and its VJP broadcast); also probe
        # it combined with the upsample parity-collapse, whose earlier solo
        # A/B lost — the tradeoff may shift once the pool bytes are gone.
        from ctgan_tpu.models import blocks

        for label, (mpf, fuc) in (
            ("_mpf", (True, False)),
            ("_mpf_fuc", (True, True)),
        ):
            old = (blocks.FUSE_MEANPOOL_CONV, blocks.FUSE_UPSAMPLE_CONV)
            blocks.FUSE_MEANPOOL_CONV, blocks.FUSE_UPSAMPLE_CONV = mpf, fuc
            try:
                w = build_workload("resnet", tiny=t)
                _measure(w.name + label, w.init_state, w.step_fn,
                         w.make_batch, w.batch_size, w.critic_iters,
                         args.iters)
            finally:
                blocks.FUSE_MEANPOOL_CONV, blocks.FUSE_UPSAMPLE_CONV = old
    if "resnet_bf16opt_ab" in wl:
        # bf16 optimizer-state residency (ROADMAP "further-out lever"): Adam
        # m/v in bf16 halve the opt-state HBM traffic on a byte-bound step.
        # Measured under the SHIPPED r4 config (fused mean-pool) so the
        # delta composes with what ships; numerics risk means adoption
        # additionally needs an at-schedule equivalence run, not just this
        # stopwatch.
        old = blocks.FUSE_MEANPOOL_CONV
        blocks.FUSE_MEANPOOL_CONV = True
        try:
            for label, ov in (
                ("_fused", {}),
                ("_fused_bf16opt", {"opt_state_dtype": "bfloat16"}),
            ):
                w = build_workload("resnet", tiny=t, **ov)
                _measure(w.name + label, w.init_state, w.step_fn,
                         w.make_batch, w.batch_size, w.critic_iters,
                         args.iters)
        finally:
            blocks.FUSE_MEANPOOL_CONV = old
    if "good64_mpf" in wl:
        from ctgan_tpu.models import blocks

        old = blocks.FUSE_MEANPOOL_CONV
        blocks.FUSE_MEANPOOL_CONV = True
        try:
            w = build_workload("good64", tiny=t)
            _measure(w.name + "_mpf", w.init_state, w.step_fn, w.make_batch,
                     w.batch_size, w.critic_iters, args.iters)
        finally:
            blocks.FUSE_MEANPOOL_CONV = old
    if "good64" in wl:
        # remat A/B like lsun128: good64's step is HBM-bound with 178 GB/iter
        # accessed (cost_analysis r3) — measure whether trading recompute
        # flops for residual traffic pays on hardware.
        for remat in (False, True):
            w = build_workload("good64", tiny=t, remat=remat)
            _measure(w.name + ("_remat" if remat else ""), w.init_state,
                     w.step_fn, w.make_batch, w.batch_size, w.critic_iters,
                     args.iters)
    if "io64" in wl:
        _io64(args)
    if "lsun128_mpf" in wl:
        # lsun128's only mean-pool site is the 1x1 down-shortcut
        # (blocks.residual_block_stride) — small lever, but the shortcut
        # still materializes a full-res activation per down block.
        old = blocks.FUSE_MEANPOOL_CONV
        blocks.FUSE_MEANPOOL_CONV = True
        try:
            w = build_workload("lsun128", tiny=t, remat=False)
            _measure(w.name + "_mpf", w.init_state, w.step_fn, w.make_batch,
                     w.batch_size, w.critic_iters, args.iters)
        finally:
            blocks.FUSE_MEANPOOL_CONV = old
    if "lsun128" in wl:
        # remat both ways: the leak that forced per-process isolation and
        # remat=False in round 2 is fixed (train/remat.py); measure the
        # HBM-vs-FLOPs tradeoff explicitly.
        for remat in (False, True) if args.lsun_remat == "both" else (
            (args.lsun_remat == "on",)
        ):
            w = build_workload("lsun128", tiny=t, remat=remat)
            _measure(w.name + ("_remat" if remat else ""), w.init_state,
                     w.step_fn, w.make_batch, w.batch_size, w.critic_iters,
                     args.iters)


def _io64(args):
    # Input-path comparison on the 64x64 workload: HBM-resident
    # DeviceSampler (selection in-step, zero host transfer) vs the
    # native C++ BatchPipeline (host-threaded decode/flip/normalize +
    # per-iteration host->device feed) — quantifies whether the native
    # pipeline keeps a real device step fed.
    import time
    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ctgan_tpu.core import init_context, rng_context, split_params
    from ctgan_tpu.data import DeviceSampler
    from ctgan_tpu.data.native import NativePipeline, native_available
    from ctgan_tpu.models import good64
    from ctgan_tpu.train import GanConfig, make_gan_trainer

    rng = np.random.default_rng(0)
    t = args.tiny
    dim, batch, k = (8, 4, 2) if t else (64, 64, 5)
    out_dim = 64 * 64 * 3
    n = 256 if t else 4096
    images = rng.integers(0, 256, size=(n, out_dim), dtype=np.uint8)
    gen_fn = partial(good64.good64_generator, dim=dim)
    disc_fn = lambda x: good64.good64_discriminator(x, dim)
    cfg = GanConfig(batch_size=batch, critic_iters=k)
    init_state, step_fn, _, _ = make_gan_trainer(gen_fn, disc_fn, cfg)
    with init_context(seed=0) as ctx:
        with rng_context(jax.random.PRNGKey(0)):
            disc_fn(gen_fn(2))
    gp, dp, _ = split_params(ctx.params, "Generator", "Discriminator")
    key = jax.random.PRNGKey(0)

    def run_path(name, next_stack, in_jit_dequant):
        if in_jit_dequant:
            def step(state, raw, key):
                real = 2.0 * (raw.astype(jnp.float32) / 255.0 - 0.5)
                return step_fn(state, real, key)
        else:
            step = step_fn
        from ctgan_tpu.core import tuned_compiler_options

        jit_step = jax.jit(step, donate_argnums=0,
                           compiler_options=tuned_compiler_options())
        # fresh buffers per path: donate_argnums=0 consumes them
        state = init_state(
            jax.tree.map(lambda x: x.copy(), gp),
            jax.tree.map(lambda x: x.copy(), dp),
        )
        state, m = jit_step(state, next_stack(0), key)
        float(m["disc_cost"])
        state, m = jit_step(state, next_stack(1), key)
        float(m["disc_cost"])
        # per-iteration value fetch: the native path needs a host batch
        # every iteration, so scan-window timing doesn't apply; both
        # arms pay identical per-iter readback overhead, keeping the
        # input-path COMPARISON fair (absolute numbers include ~1 relay
        # round trip per iteration on tunneled devices)
        t0 = time.perf_counter()
        data_s = 0.0
        for i in range(2, 2 + args.iters):
            td = time.perf_counter()
            stack = next_stack(i)
            data_s += time.perf_counter() - td
            state, m = jit_step(state, stack, key)
            float(m["disc_cost"])
        sec = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "workload": name,
            "sec_per_iter": round(sec, 4),
            "images_per_sec": round(batch * k / sec, 1),
            "data_sec_per_iter": round(data_s / args.iters, 4),
            "disc_cost": float(m["disc_cost"]),
        }), flush=True)

    sampler = DeviceSampler([images.astype("uint8")], batch, k)
    data_args = tuple(sampler.arrays)
    run_path(
        "good64_input_device_sampler",
        lambda i: sampler.sample(jnp.asarray(i), data_args, sampler.host_perm(i)),
        in_jit_dequant=True,
    )
    if native_available():
        pipe = NativePipeline(
            images, None, batch, k, chw=(3, 64, 64), flip=True,
            scale=2.0 / 255.0, shift=-1.0, n_threads=2,
        )
        try:
            run_path(
                "good64_input_native_pipeline",
                lambda i: jnp.asarray(pipe.next()[0]),
                in_jit_dequant=False,
            )
        finally:
            pipe.close()
    else:
        print(json.dumps({"workload": "good64_input_native_pipeline",
                          "error": "native library unavailable"}))


if __name__ == "__main__":
    main()
