"""Cross-framework gradient validation of the flagship training step.

The riskiest math in the framework is the discriminator loss of
``train/trainer_acgan.py``: a grad-of-grad gradient penalty through the full
ResNet discriminator (with the fused conv+mean_pool rewrite and dropout masks
held constant), the CT term between two independently-dropout-perturbed
passes, and the ACGAN CE — all differentiated w.r.t. every parameter.  The
existing unit tests pin GP against finite differences on a few coordinates
(tests/test_losses.py); this module checks EVERY parameter gradient of the
real flagship loss against an independent implementation in torch/fp64
autograd (``create_graph=True`` double backward), built op-by-op from the
reference semantics (CT_gan_cifar_resnet.py:89-186, 205-300) rather than
from this repo's JAX code paths.

Dropout masks are made common to both sides by injecting explicit PRNG keys
into the model's dropout calls and recomputing the identical masks for the
torch replica — so the comparison covers the *training* configuration
(kp=0.8/0.5/0.5), not a deterministic stand-in.

JAX runs its shipped fp32 path (including FUSE_MEANPOOL's stride-2 rewrite);
torch runs naive fp64 conv→pool.  Agreement therefore simultaneously
validates the fused rewrite, the double backward, and the loss assembly
against a second autodiff system.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from ctgan_tpu.core import apply_context, init_context, rng_context, split_params
from ctgan_tpu.losses.gan import (
    acgan_loss,
    consistency_term,
    gradient_penalty,
    wgan_losses,
)
from ctgan_tpu.models import resnet_cifar

DIM = 12          # small but even + multi-channel; 32x32 input as shipped
BATCH = 4
N_LABELS = 10
KP = (0.8, 0.5, 0.5)
CFG = resnet_cifar.ResnetCifarConfig(dim_g=DIM, dim_d=DIM)


# ---------------------------------------------------------------- fixtures


def _init_params():
    with init_context(seed=11) as ctx:
        with rng_context(jax.random.PRNGKey(0)):
            labels = jnp.zeros((2,), jnp.int32)
            fake = resnet_cifar.generator(2, labels, cfg=CFG)
            resnet_cifar.discriminator(fake, labels, *KP, CFG)
    gen_params, disc_params, rest = split_params(
        ctx.params, "Generator", "Discriminator"
    )
    assert not rest, sorted(rest)
    return gen_params, disc_params


@pytest.fixture(scope="module")
def setup():
    gen_params, disc_params = _init_params()
    rng = np.random.default_rng(3)
    real = jnp.asarray(rng.uniform(-1, 1, size=(BATCH, 3072)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, N_LABELS, size=(BATCH,)), jnp.int32)
    noise = jnp.asarray(rng.normal(size=(BATCH, 128)), jnp.float32)
    with rng_context(jax.random.PRNGKey(5)):
        with apply_context(gen_params):
            fake = resnet_cifar.generator(BATCH, labels, noise=noise, cfg=CFG)
    return dict(
        gen_params=gen_params, disc_params=disc_params,
        real=real, fake=fake, labels=labels, noise=noise,
    )


class _KeyedDropout:
    """Replaces resnet_cifar.dropout: same math, but keys come from a fixed
    pre-split list so the torch side can recompute the identical masks.
    Records (key, shape, kp) per call in trace order."""

    def __init__(self, base_key, n):
        self.keys = list(jax.random.split(base_key, n))
        self.calls: list[tuple] = []
        self._i = 0

    def __call__(self, x, keep_prob, *, deterministic=False, **kw):
        from ctgan_tpu.ops import dropout as real_dropout

        if deterministic or (
            isinstance(keep_prob, (int, float)) and keep_prob >= 1.0
        ):
            return x
        key = self.keys[self._i]
        self._i += 1
        self.calls.append((key, tuple(x.shape), float(keep_prob)))
        return real_dropout(x, keep_prob, key=key)

    def reset(self):
        self._i = 0
        self.calls = []

    def masks(self):
        """Recompute every recorded mask eagerly (bool, NHWC)."""
        return [
            np.asarray(jax.random.uniform(k, shape, jnp.float32) < kp)
            for k, shape, kp in self.calls
        ]


# ---------------------------------------------------- torch discriminator


def _to_torch_params(params):
    out = {}
    for name, v in params.items():
        a = np.asarray(v, np.float64)
        t = torch.tensor(a, dtype=torch.float64, requires_grad=True)
        out[name] = t
    return out


def _t_conv(p, name, x, ksize):
    # JAX filters are HWIO; torch wants OIHW.  SAME padding for odd K,
    # stride 1 is symmetric (K-1)//2.
    w = p[name + ".Filters"].permute(3, 2, 0, 1)
    b = p[name + ".Biases"]
    return F.conv2d(x, w, b, padding=(ksize - 1) // 2)


def _t_pool(x):
    return F.avg_pool2d(x, 2)


def _t_drop(x, mask_nhwc, kp):
    mask = torch.tensor(
        np.transpose(mask_nhwc, (0, 3, 1, 2)), dtype=torch.bool
    )
    return torch.where(mask, x / kp, torch.zeros((), dtype=x.dtype))


def _t_res_block_down(p, name, x):
    s = _t_pool(_t_conv(p, name + ".Shortcut", x, 1))
    o = F.relu(x)
    o = _t_conv(p, name + ".Conv1", o, 3)
    o = F.relu(o)
    o = _t_pool(_t_conv(p, name + ".Conv2", o, 3))
    return s + o


def _t_res_block_plain(p, name, x):
    o = F.relu(x)
    o = _t_conv(p, name + ".Conv1", o, 3)
    o = F.relu(o)
    o = _t_conv(p, name + ".Conv2", o, 3)
    return x + o


def torch_discriminator(p, x_flat, masks):
    """fp64 replica of resnet_cifar.discriminator (CT_gan_cifar_resnet.py:
    169-186): OptimizedResBlockDisc1, down block, two plain blocks with
    per-block dropout, global mean pool, WGAN + ACGAN linear heads.
    ``masks`` is the 3-element NHWC mask list for this pass (or None for a
    clean pass)."""
    x = x_flat.reshape(-1, 3, 32, 32)  # CHW-flat -> NCHW directly
    # OptimizedResBlockDisc1: shortcut = conv1x1(mean_pool(x)); main =
    # conv3 -> relu -> conv3 -> mean_pool (blocks.py:257-264)
    s = _t_conv(p, "Discriminator.1.Shortcut", _t_pool(x), 1)
    o = F.relu(_t_conv(p, "Discriminator.1.Conv1", x, 3))
    o = _t_pool(_t_conv(p, "Discriminator.1.Conv2", o, 3))
    x = s + o
    x = _t_res_block_down(p, "Discriminator.2", x)
    if masks is not None:
        x = _t_drop(x, masks[0], KP[0])
    x = _t_res_block_plain(p, "Discriminator.3", x)
    if masks is not None:
        x = _t_drop(x, masks[1], KP[1])
    x = _t_res_block_plain(p, "Discriminator.4", x)
    if masks is not None:
        x = _t_drop(x, masks[2], KP[2])
    x = F.relu(x)
    feat = x.mean(dim=(2, 3))
    wgan = feat @ p["Discriminator.Output.W"] + p["Discriminator.Output.b"]
    acgan = feat @ p["Discriminator.ACGANOutput.W"] + p["Discriminator.ACGANOutput.b"]
    return wgan.reshape(-1), feat, acgan


# ------------------------------------------------------- torch generator


def _t_upsample(x):
    return F.interpolate(x, scale_factor=2, mode="nearest")


def _t_cond_bn(p, name, x, labels):
    mean = x.mean(dim=(0, 2, 3), keepdim=True)
    var = ((x - mean) ** 2).mean(dim=(0, 2, 3), keepdim=True)
    xn = (x - mean) / torch.sqrt(var + 1e-5)
    scale = p[name + ".scale"][labels][:, :, None, None]
    offset = p[name + ".offset"][labels][:, :, None, None]
    return xn * scale + offset


def _t_bn(p, name, x):
    mean = x.mean(dim=(0, 2, 3), keepdim=True)
    var = ((x - mean) ** 2).mean(dim=(0, 2, 3), keepdim=True)
    xn = (x - mean) / torch.sqrt(var + 1e-5)
    scale = p[name + ".scale"][None, :, None, None]
    offset = p[name + ".offset"][None, :, None, None]
    return xn * scale + offset


def _t_res_block_up(p, name, x, labels):
    s = _t_conv(p, name + ".Shortcut", _t_upsample(x), 1)
    o = _t_cond_bn(p, name + ".N1", x, labels)
    o = F.relu(o)
    o = _t_conv(p, name + ".Conv1", _t_upsample(o), 3)
    o = _t_cond_bn(p, name + ".N2", o, labels)
    o = F.relu(o)
    o = _t_conv(p, name + ".Conv2", o, 3)
    return s + o


def torch_generator(p, z, labels):
    """fp64 replica of resnet_cifar.generator (CT_gan_cifar_resnet.py:
    155-167): linear to 4x4, three up blocks with conditional BN, plain BN,
    relu, output conv, tanh, NCHW-flat."""
    out = z @ p["Generator.Input.W"] + p["Generator.Input.b"]
    # JAX reshapes the linear output to NHWC [N,4,4,C]
    out = out.reshape(-1, 4, 4, DIM).permute(0, 3, 1, 2)
    for i in (1, 2, 3):
        out = _t_res_block_up(p, f"Generator.{i}", out, labels)
    out = _t_bn(p, "Generator.OutputN", out)
    out = F.relu(out)
    out = _t_conv(p, "Generator.Output", out, 3)
    out = torch.tanh(out)
    return out.reshape(out.shape[0], -1)  # NCHW -> CHW-flat


def _sparse_ce(logits, labels):
    logp = F.log_softmax(logits, dim=1)
    return -logp[torch.arange(logits.shape[0]), labels].mean()


# ------------------------------------------------------------------ tests


def _compare_grads(jax_grads, torch_params, what, rtol=1e-3):
    """Per-parameter comparison, tolerance scaled to each tensor's magnitude
    (JAX runs fp32; torch is the fp64 truth).  The per-tensor scale is
    floored at 1% of the largest gradient anywhere: parameters whose true
    gradient is analytically ~0 (e.g. a conv bias feeding straight into a
    batch norm, which subtracts constant channel shifts) would otherwise
    turn pure cancellation noise into a relative-error failure."""
    global_scale = max(
        float(np.max(np.abs(tp.grad.detach().numpy())))
        for tp in torch_params.values()
    )
    checked = 0
    for name, jg in jax_grads.items():
        tp = torch_params[name]
        assert tp.grad is not None, f"{what}: no torch grad for {name}"
        # torch leaves keep the JAX HWIO layout (permuted to OIHW only at
        # use inside _t_conv), so grads compare directly.
        tg = tp.grad.detach().numpy()
        jg = np.asarray(jg, np.float64)
        assert jg.shape == tg.shape, (name, jg.shape, tg.shape)
        scale = max(float(np.max(np.abs(tg))), 1e-2 * global_scale)
        dev = float(np.max(np.abs(jg - tg))) / scale
        assert dev < rtol, f"{what}: {name} grad deviates {dev:.2e} (scale {scale:.2e})"
        checked += 1
    assert checked == len(torch_params)


def test_disc_loss_grads_match_torch_fp64(setup, monkeypatch):
    """Full disc loss — WGAN + CT (two real dropout draws) + 10*GP (double
    backward) + ACGAN CE — same value and same gradient for every
    discriminator parameter in two independent autodiff systems."""
    disc_params = setup["disc_params"]
    real, fake, labels = setup["real"], setup["fake"], setup["labels"]
    alpha_key = jax.random.PRNGKey(21)

    keyed = _KeyedDropout(jax.random.PRNGKey(77), 9)
    monkeypatch.setattr(resnet_cifar, "dropout", keyed)

    both = jnp.concatenate([real, fake], axis=0)
    both_labels = jnp.concatenate([labels, labels], axis=0)

    def disc_loss(dp):
        keyed.reset()
        with apply_context(dp):
            d1 = resnet_cifar.discriminator(both, both_labels, *KP, CFG)
            d2 = resnet_cifar.discriminator(both, both_labels, *KP, CFG)
            d_real, d_fake = d1.wgan[:BATCH], d1.wgan[BATCH:]
            _, wgan = wgan_losses(d_real, d_fake)
            ct = consistency_term(
                d_real, d2.wgan[:BATCH], d1.features[:BATCH],
                d2.features[:BATCH], lambda_2=2.0, factor_m=0.0,
            )
            gp, _ = gradient_penalty(
                lambda x: (
                    resnet_cifar.discriminator(x, labels, *KP, CFG).wgan,
                    None,
                ),
                real, fake, alpha_key,
            )
            ac = acgan_loss(d1.acgan[:BATCH], labels)
            return wgan + ct + 10.0 * gp + ac

    jax_cost, jax_grads = jax.value_and_grad(disc_loss)(disc_params)
    masks = keyed.masks()
    assert len(masks) == 9  # 3 per pass: d1, d2, GP inner

    # --- independent torch/fp64 replica
    p = _to_torch_params(disc_params)
    both_t = torch.tensor(np.asarray(both, np.float64))
    labels_t = torch.tensor(np.asarray(labels))

    w1, f1, a1 = torch_discriminator(p, both_t, masks[0:3])
    w2, f2, _ = torch_discriminator(p, both_t, masks[3:6])
    d_real_t, d_fake_t = w1[:BATCH], w1[BATCH:]
    wgan_t = d_fake_t.mean() - d_real_t.mean()
    ct_t = 2.0 * (d_real_t - w2[:BATCH]) ** 2
    ct_t = ct_t + 2.0 * 0.1 * ((f1[:BATCH] - f2[:BATCH]) ** 2).mean(dim=1)
    ct_t = torch.clamp(ct_t - 0.0, min=0.0).mean()

    alpha = np.asarray(
        jax.random.uniform(alpha_key, (BATCH, 1), jnp.float32), np.float64
    )
    interp_np = np.asarray(real, np.float64) + alpha * (
        np.asarray(fake, np.float64) - np.asarray(real, np.float64)
    )
    interp = torch.tensor(interp_np, requires_grad=True)
    w_i, _, _ = torch_discriminator(p, interp, masks[6:9])
    (g_i,) = torch.autograd.grad(w_i.sum(), interp, create_graph=True)
    slopes = torch.sqrt((g_i**2).sum(dim=1) + 1e-12)
    gp_t = ((slopes - 1.0) ** 2).mean()

    ac_t = _sparse_ce(a1[:BATCH], labels_t)
    cost_t = wgan_t + ct_t + 10.0 * gp_t + ac_t
    cost_t.backward()

    assert abs(float(jax_cost) - float(cost_t.detach())) < 5e-4 * max(1.0, abs(float(cost_t.detach())))
    _compare_grads(jax_grads, p, "disc")


def test_gen_loss_grads_match_torch_fp64(setup, monkeypatch):
    """Generator loss — -mean(D(G(z))) + 0.1*ACGAN CE — gradients flow
    through the D (with dropout) into every G parameter: conditional BN,
    upsample convs, output BN/conv/tanh all cross-checked."""
    gen_params, disc_params = setup["gen_params"], setup["disc_params"]
    labels, noise = setup["labels"], setup["noise"]

    keyed = _KeyedDropout(jax.random.PRNGKey(99), 3)
    monkeypatch.setattr(resnet_cifar, "dropout", keyed)

    def gen_loss(gp_):
        keyed.reset()
        with apply_context({**gp_, **disc_params}):
            fake = resnet_cifar.generator(BATCH, labels, noise=noise, cfg=CFG)
            d = resnet_cifar.discriminator(fake, labels, *KP, CFG)
            return -jnp.mean(d.wgan) + 0.1 * acgan_loss(d.acgan, labels)

    jax_cost, jax_grads = jax.value_and_grad(gen_loss)(gen_params)
    masks = keyed.masks()
    assert len(masks) == 3

    pg = _to_torch_params(gen_params)
    pd = _to_torch_params(disc_params)
    z = torch.tensor(np.asarray(noise, np.float64))
    labels_t = torch.tensor(np.asarray(labels))

    fake_t = torch_generator(pg, z, labels_t)
    w, _, a = torch_discriminator(pd, fake_t, masks)
    cost_t = -w.mean() + 0.1 * _sparse_ce(a, labels_t)
    cost_t.backward()

    assert abs(float(jax_cost) - float(cost_t.detach())) < 5e-4 * max(1.0, abs(float(cost_t.detach())))
    _compare_grads(jax_grads, pg, "gen")

    # the JAX fake itself must match the torch replica's forward
    np.testing.assert_allclose(
        np.asarray(setup["fake"], np.float64),
        fake_t.detach().numpy(),
        atol=5e-5,
    )
