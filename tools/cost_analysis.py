"""Compiler cost analysis of the flagship train step.

Prints XLA's flop/byte estimates for the fused CT-GAN iteration and, when a
measured sec/iter is passed, the implied MXU utilization — the
speed-of-light accounting used to direct kernel work.

    python tools/cost_analysis.py [--sec_per_iter 0.0243] [--peak_tflops 197]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sec_per_iter", type=float, default=None)
    ap.add_argument("--peak_tflops", type=float, default=197.0,
                    help="bf16 peak of the chip (v5e ≈ 197 TFLOP/s)")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--bf16", action="store_true",
                    help="force the bf16 activation policy even off-TPU "
                         "(for byte accounting)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ctgan_tpu.core import default_tpu_policy
    from ctgan_tpu.data import DeviceSampler
    from ctgan_tpu.data.synthetic import synthetic_cifar10
    from ctgan_tpu.models import resnet_cifar
    from ctgan_tpu.train.trainer_acgan import AcganConfig, make_acgan_trainer
    from __graft_entry__ import _init_flagship

    on_tpu = jax.devices()[0].platform != "cpu"
    default_tpu_policy(enable_bf16=on_tpu or args.bf16)

    cfg_model = resnet_cifar.ResnetCifarConfig(dim_g=args.dim, dim_d=args.dim)
    cfg = AcganConfig(batch_size=args.batch, critic_iters=5, iters=100000)

    def gen_fn(n, labels, noise=None):
        return resnet_cifar.generator(n, labels, noise=noise, cfg=cfg_model)

    def disc_fn(x, labels, kp1, kp2, kp3):
        return resnet_cifar.discriminator(x, labels, kp1, kp2, kp3, cfg_model)

    init_state, step_fn, _s, _g, _d = make_acgan_trainer(gen_fn, disc_fn, cfg)
    gen_params, disc_params = _init_flagship(cfg_model)
    state = init_state(gen_params, disc_params)
    (tx, ty), _ = synthetic_cifar10(n_train=args.batch * 5 * 2)
    sampler = DeviceSampler([tx.astype("int32"), ty.astype("int32")], args.batch, 5)

    def full(state, i, key):
        r, l = sampler.sample(i)
        return step_fn(state, r, l, key)

    lowered = jax.jit(full, donate_argnums=0).lower(
        state, jnp.asarray(0), jax.random.PRNGKey(0)
    )
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", float("nan"))
    bytes_ = ca.get("bytes accessed", float("nan"))
    print(f"flops/iter:          {flops:.3e}")
    print(f"bytes accessed/iter: {bytes_:.3e}")
    mem = compiled.memory_analysis()
    if mem is not None:
        for attr in ("temp_size_in_bytes", "argument_size_in_bytes",
                     "output_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(mem, attr, None)
            if v is not None:
                print(f"{attr}: {v/1e6:.1f} MB")
    if args.sec_per_iter:
        achieved = flops / args.sec_per_iter / 1e12
        print(f"achieved: {achieved:.1f} TFLOP/s "
              f"({100 * achieved / args.peak_tflops:.1f}% of {args.peak_tflops} TFLOP/s peak)")
        hbm_gbps = bytes_ / args.sec_per_iter / 1e9
        print(f"HBM traffic: {hbm_gbps:.0f} GB/s (v5e peak ~819 GB/s)")


if __name__ == "__main__":
    main()
