"""Compiler cost analysis + roofline accounting for any workload's train step.

Prints XLA's flop/byte estimates for the fused CT-GAN iteration, the implied
compute- and HBM-bound step-time floors, and (when a measured sec/iter is
passed) the fraction of the binding roofline achieved — the speed-of-light
accounting used to direct kernel work (VERDICT r2 #1: every workload gets
the flagship treatment).

    python tools/cost_analysis.py --workload good64 [--sec_per_iter 0.2119]
    python tools/cost_analysis.py                   # flagship, legacy path
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

# v5e-1 peaks (public spec): ~197 TFLOP/s bf16, ~819 GB/s HBM.
V5E_PEAK_TFLOPS = 197.0
V5E_PEAK_GBPS = 819.0


def analyze(compiled, sec_per_iter=None, peak_tflops=V5E_PEAK_TFLOPS,
            peak_gbps=V5E_PEAK_GBPS, name="step"):
    """Roofline verdict for one compiled XLA program."""
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", float("nan")))
    bytes_ = float(ca.get("bytes accessed", float("nan")))
    compute_floor = flops / (peak_tflops * 1e12)
    hbm_floor = bytes_ / (peak_gbps * 1e9)
    bound = "hbm" if hbm_floor > compute_floor else "compute"
    out = {
        "name": name,
        "flops_per_iter": flops,
        "bytes_per_iter": bytes_,
        "compute_floor_s": round(compute_floor, 5),
        "hbm_floor_s": round(hbm_floor, 5),
        "bound": bound,
        "arithmetic_intensity": round(flops / max(bytes_, 1.0), 1),
    }
    mem = compiled.memory_analysis()
    if mem is not None:
        for attr in ("temp_size_in_bytes", "argument_size_in_bytes",
                     "output_size_in_bytes"):
            v = getattr(mem, attr, None)
            if v is not None:
                out[attr.replace("_in_bytes", "_mb")] = round(v / 1e6, 1)
    if sec_per_iter:
        floor = max(compute_floor, hbm_floor)
        out["sec_per_iter"] = sec_per_iter
        out["pct_of_roofline"] = round(100 * floor / sec_per_iter, 1)
        out["achieved_tflops"] = round(flops / sec_per_iter / 1e12, 1)
        out["mfu_pct"] = round(100 * flops / sec_per_iter / (peak_tflops * 1e12), 1)
        out["hbm_gbps"] = round(bytes_ / sec_per_iter / 1e9, 1)
    return out


def compile_workload(which: str, tiny: bool = False, compiler_options=None,
                     **overrides):
    """Lower+compile one shared-builder workload's fused step."""
    import jax

    from workloads import build_workload

    w = build_workload(which, tiny=tiny, **overrides)
    state = w.init_state()
    batch = w.make_batch(0)
    key = jax.random.PRNGKey(0)
    lowered = jax.jit(w.step_fn, donate_argnums=0,
                      compiler_options=compiler_options).lower(
        state, *batch, key)
    return w, lowered.compile()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="flagship",
                    help="flagship (legacy DeviceSampler-fused path) or one "
                         "of mnist,cifar,resnet,good64,lsun128")
    ap.add_argument("--sec_per_iter", type=float, default=None)
    ap.add_argument("--peak_tflops", type=float, default=V5E_PEAK_TFLOPS,
                    help="bf16 peak of the chip (v5e ~= 197 TFLOP/s)")
    ap.add_argument("--peak_gbps", type=float, default=V5E_PEAK_GBPS)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialized D forward (gan-family workloads)")
    ap.add_argument("--noclean", action="store_true",
                    help="drop the kp=1 monitoring pass (resnet workload)")
    ap.add_argument("--bf16opt", action="store_true",
                    help="store Adam moments in bf16 (optim.with_state_dtype)")
    ap.add_argument("--bf16", action="store_true",
                    help="force the bf16 activation policy even off-TPU "
                         "(for byte accounting)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (sitecustomize registers the "
                         "axon TPU backend in every process; the env var "
                         "alone does not override it)")
    args = ap.parse_args()

    if args.cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from ctgan_tpu.core import default_tpu_policy

    on_tpu = jax.devices()[0].platform != "cpu"
    default_tpu_policy(enable_bf16=on_tpu or args.bf16)
    if on_tpu:
        from ctgan_tpu.ops.dropout import enable_pallas_dropout

        enable_pallas_dropout(True)

    if args.workload != "flagship":
        overrides = {}
        suffix = ""
        if args.remat:
            overrides["remat"] = True
            suffix += "_remat"
        if args.noclean:
            overrides["clean_pass"] = False
            suffix += "_noclean"
        if args.bf16opt:
            overrides["opt_state_dtype"] = "bfloat16"
            suffix += "_bf16opt"
        w, compiled = compile_workload(args.workload, tiny=args.tiny, **overrides)
        out = analyze(compiled, args.sec_per_iter, args.peak_tflops,
                      args.peak_gbps, name=w.name + suffix)
        out["batch"] = w.batch_size
        out["critic_iters"] = w.critic_iters
        if args.sec_per_iter:
            out["images_per_sec"] = round(
                w.batch_size * w.critic_iters / args.sec_per_iter, 1
            )
        print(json.dumps(out), flush=True)
        return

    # ------------- legacy flagship path (DeviceSampler fused into the step)
    from ctgan_tpu.data import DeviceSampler
    from ctgan_tpu.data.synthetic import synthetic_cifar10
    from ctgan_tpu.models import resnet_cifar
    from ctgan_tpu.train.trainer_acgan import AcganConfig, make_acgan_trainer
    from __graft_entry__ import _init_flagship

    cfg_model = resnet_cifar.ResnetCifarConfig(dim_g=args.dim, dim_d=args.dim)
    cfg = AcganConfig(batch_size=args.batch, critic_iters=5, iters=100000,
                      remat=args.remat)

    def gen_fn(n, labels, noise=None):
        return resnet_cifar.generator(n, labels, noise=noise, cfg=cfg_model)

    def disc_fn(x, labels, kp1, kp2, kp3):
        return resnet_cifar.discriminator(x, labels, kp1, kp2, kp3, cfg_model)

    init_state, step_fn, _s, _g, _d = make_acgan_trainer(gen_fn, disc_fn, cfg)
    gen_params, disc_params = _init_flagship(cfg_model)
    state = init_state(gen_params, disc_params)
    (tx, ty), _ = synthetic_cifar10(n_train=args.batch * 5 * 2)
    sampler = DeviceSampler([tx.astype("uint8"), ty.astype("int32")], args.batch, 5)

    def full(state, i, key):
        r, l = sampler.sample(i)
        return step_fn(state, r, l, key)

    compiled = jax.jit(full, donate_argnums=0).lower(
        state, jnp.asarray(0), jax.random.PRNGKey(0)
    ).compile()
    out = analyze(compiled, args.sec_per_iter, args.peak_tflops,
                  args.peak_gbps, name="flagship" + ("_remat" if args.remat else ""))
    if args.sec_per_iter:
        out["images_per_sec"] = round(args.batch * 5 / args.sec_per_iter, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
