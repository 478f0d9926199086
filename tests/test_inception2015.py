"""File-based Inception-2015 IS path: protobuf wire parser, JAX graph
executor, and the end-to-end file -> score protocol.

Since the real 100MB inception-2015-12-05.tgz cannot be downloaded here
(zero egress), these tests hand-encode a miniature frozen graph in the real
GraphDef wire format, exercising the same ops the Inception graph uses
(Conv2D/BatchNormWithGlobalNormalization/Relu/MaxPool/AvgPool/Concat/
ResizeBilinear/MatMul/Softmax).  When a user supplies the real file, the
identical code path produces reference-comparable scores.
"""

import struct

import numpy as np
import pytest

from ctgan_tpu.eval.graphdef import parse_graphdef, tensor_to_numpy
from ctgan_tpu.eval import inception2015
from ctgan_tpu.eval.inception2015 import Inception2015, _tf_resize_bilinear


# ---------------------------------------------------------------- encoder
# Minimal protobuf writer (test-side mirror of the parser).

def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(fnum: int, wt: int) -> bytes:
    return _varint((fnum << 3) | wt)


def _ld(fnum: int, payload: bytes) -> bytes:  # length-delimited
    return _tag(fnum, 2) + _varint(len(payload)) + payload


def _enc_shape(dims) -> bytes:
    out = b""
    for d in dims:
        out += _ld(2, _tag(1, 0) + _varint(d))
    return out


def _enc_tensor(arr: np.ndarray) -> bytes:
    arr = np.asarray(arr)
    dt = {np.dtype("float32"): 1, np.dtype("int32"): 3, np.dtype("int64"): 9}[arr.dtype]
    out = _tag(1, 0) + _varint(dt)
    out += _ld(2, _enc_shape(arr.shape))
    out += _ld(4, arr.tobytes())
    return out


def _attr_tensor(arr) -> bytes:
    return _ld(8, _enc_tensor(np.asarray(arr)))


def _attr_s(s: bytes) -> bytes:
    return _ld(2, s)


def _attr_b(b: bool) -> bytes:
    return _tag(5, 0) + _varint(int(b))


def _attr_f(f: float) -> bytes:
    return _tag(4, 5) + struct.pack("<f", f)


def _attr_type(t: int) -> bytes:
    return _tag(6, 0) + _varint(t)


def _attr_list_i(vals) -> bytes:
    packed = b"".join(_varint(v) for v in vals)
    return _ld(1, _ld(3, packed))  # ListValue.i packed


def _node(name: str, op: str, inputs=(), attrs=None) -> bytes:
    out = _ld(1, name.encode()) + _ld(2, op.encode())
    for i in inputs:
        out += _ld(3, i.encode())
    for k, v in (attrs or {}).items():
        out += _ld(5, _ld(1, k.encode()) + _ld(2, v))
    return _ld(1, out)  # GraphDef.node


def _const(name: str, arr) -> bytes:
    return _node(name, "Const", attrs={"value": _attr_tensor(arr)})


# ---------------------------------------------------------------- tests


def test_parse_roundtrip_const():
    arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    nodes = parse_graphdef(_const("w", arr))
    assert nodes[0].name == "w" and nodes[0].op == "Const"
    np.testing.assert_array_equal(tensor_to_numpy(nodes[0].attrs["value"].tensor), arr)


def test_parse_node_inputs_and_attrs():
    gd = _node("c", "Conv2D", inputs=["x", "w"], attrs={
        "strides": _attr_list_i([1, 2, 2, 1]),
        "padding": _attr_s(b"SAME"),
    })
    (n,) = parse_graphdef(gd)
    assert n.inputs == ["x", "w"]
    assert n.attrs["strides"].list_i == [1, 2, 2, 1]
    assert n.attrs["padding"].s == b"SAME"


def test_tf_resize_bilinear_semantics():
    """TF1 align_corners=False: src = dst * in/out (not half-pixel)."""
    import jax.numpy as jnp

    x = np.arange(4, dtype=np.float32).reshape(1, 2, 2, 1)
    out = np.asarray(_tf_resize_bilinear(jnp, jnp.asarray(x), 4, 4))
    # TF1 semantics golden (computed by the formula): scale=0.5,
    # src rows [0, .5, 1, 1.5] -> rows interpolate [0,1],[1,2] halfway
    expect_rows = np.array([0.0, 0.5, 1.0, 1.0])  # col interp of row 0
    np.testing.assert_allclose(out[0, 0, :, 0], expect_rows, atol=1e-6)
    np.testing.assert_allclose(out[0, -1, :, 0], expect_rows + 2, atol=1e-6)


def _mini_inception_graphdef(rng):
    """A miniature classify_image-shaped graph:
    ExpandDims -> ResizeBilinear(8x8) -> Sub -> Mul -> Conv2D -> BNWGN ->
    Relu -> MaxPool -> AvgPool(VALID, global) -> pool_3 -> (Reshape)
    softmax/logits/MatMul -> Softmax.
    """
    C = 6
    conv_w = rng.normal(0, 0.3, size=(3, 3, 3, C)).astype(np.float32)
    bn_m = rng.normal(0, 0.1, size=(C,)).astype(np.float32)
    bn_v = rng.uniform(0.5, 1.5, size=(C,)).astype(np.float32)
    bn_beta = rng.normal(0, 0.1, size=(C,)).astype(np.float32)
    bn_gamma = rng.uniform(0.8, 1.2, size=(C,)).astype(np.float32)
    logits_w = rng.normal(0, 0.5, size=(C, 11)).astype(np.float32)

    gd = b""
    gd += _node("input", "Placeholder")
    gd += _const("ExpandDims/dim", np.asarray(0, np.int32))
    gd += _node("ExpandDims", "ExpandDims", ["input", "ExpandDims/dim"])
    gd += _const("resize/size", np.asarray([8, 8], np.int32))
    gd += _node("resize", "ResizeBilinear", ["ExpandDims", "resize/size"])
    gd += _const("sub/y", np.asarray(128.0, np.float32))
    gd += _node("sub", "Sub", ["resize", "sub/y"])
    gd += _const("mul/y", np.asarray(1.0 / 128.0, np.float32))
    gd += _node("mul", "Mul", ["sub", "mul/y"])
    gd += _const("conv/w", conv_w)
    gd += _node("conv", "Conv2D", ["mul", "conv/w"], attrs={
        "strides": _attr_list_i([1, 1, 1, 1]), "padding": _attr_s(b"SAME")})
    gd += _const("bn/m", bn_m)
    gd += _const("bn/v", bn_v)
    gd += _const("bn/beta", bn_beta)
    gd += _const("bn/gamma", bn_gamma)
    gd += _node("bn", "BatchNormWithGlobalNormalization",
                ["conv", "bn/m", "bn/v", "bn/beta", "bn/gamma"],
                attrs={"variance_epsilon": _attr_f(1e-3),
                       "scale_after_normalization": _attr_b(True)})
    gd += _node("relu", "Relu", ["bn"])
    gd += _node("maxpool", "MaxPool", ["relu"], attrs={
        "ksize": _attr_list_i([1, 2, 2, 1]), "strides": _attr_list_i([1, 2, 2, 1]),
        "padding": _attr_s(b"SAME")})
    gd += _node("pool_3", "AvgPool", ["maxpool"], attrs={
        "ksize": _attr_list_i([1, 4, 4, 1]), "strides": _attr_list_i([1, 1, 1, 1]),
        "padding": _attr_s(b"VALID")})
    gd += _const("squeeze_w", logits_w)
    gd += _node("squeeze", "Squeeze", ["pool_3"],
                attrs={"squeeze_dims": _attr_list_i([1, 2])})
    gd += _node("softmax/logits/MatMul", "MatMul", ["squeeze", "squeeze_w"])
    gd += _node("softmax", "Softmax", ["softmax/logits/MatMul"])
    refs = dict(conv_w=conv_w, bn=(bn_m, bn_v, bn_beta, bn_gamma),
                logits_w=logits_w)
    return gd, refs


def test_executor_against_numpy(tmp_path, rng):
    gd, refs = _mini_inception_graphdef(rng)
    pb = tmp_path / "mini.pb"
    pb.write_bytes(gd)
    inc = Inception2015(str(pb), batch_size=4)
    imgs = rng.uniform(0, 255, size=(4, 8, 8, 3)).astype(np.float32)
    feats, preds = inc.predictions(imgs)
    assert feats.shape == (4, 6) and preds.shape == (4, 11)
    np.testing.assert_allclose(preds.sum(axis=1), 1.0, atol=1e-5)

    # numpy mirror of the graph (8x8 input -> resize is identity)
    x = (imgs - 128.0) / 128.0
    # conv SAME 3x3 stride 1
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    conv = np.zeros((4, 8, 8, 6), np.float32)
    for i in range(8):
        for j in range(8):
            patch = xp[:, i:i + 3, j:j + 3, :]
            conv[:, i, j, :] = np.tensordot(patch, refs["conv_w"], axes=3)
    m, v, beta, gamma = refs["bn"]
    bn = conv * (gamma / np.sqrt(v + 1e-3)) + (beta - m * gamma / np.sqrt(v + 1e-3))
    relu = np.maximum(bn, 0)
    mp = relu.reshape(4, 4, 2, 4, 2, 6).max(axis=(2, 4))
    ap = mp.mean(axis=(1, 2))
    logits = ap @ refs["logits_w"]
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs = e / e.sum(axis=1, keepdims=True)
    np.testing.assert_allclose(feats, ap, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(preds, probs, rtol=2e-4, atol=2e-5)


def test_inception_score_protocol(tmp_path, rng):
    gd, _ = _mini_inception_graphdef(rng)
    pb = tmp_path / "mini.pb"
    pb.write_bytes(gd)
    inc = Inception2015(str(pb), batch_size=8)
    # NCHW input is auto-transposed; peaky class structure -> IS > 1
    imgs = rng.uniform(0, 255, size=(40, 3, 8, 8)).astype(np.float32)
    mean, std = inc.inception_score(imgs, splits=4)
    assert mean >= 1.0 and std >= 0.0
    fid_same = inc.fid(imgs, imgs)
    assert fid_same == pytest.approx(0.0, abs=1e-4)


def test_tgz_loading(tmp_path, rng):
    import tarfile

    gd, _ = _mini_inception_graphdef(rng)
    pb = tmp_path / "classify_image_graph_def.pb"
    pb.write_bytes(gd)
    tgz = tmp_path / "inception-2015-12-05.tgz"
    with tarfile.open(tgz, "w:gz") as tf_:
        tf_.add(pb, arcname="classify_image_graph_def.pb")
    inc = Inception2015(str(tgz), batch_size=4)
    imgs = rng.uniform(20, 255, size=(4, 8, 8, 3)).astype(np.float32)
    m, s = inc.inception_score(imgs, splits=2)
    assert np.isfinite(m)


def test_missing_file_error_is_actionable(monkeypatch, tmp_path):
    monkeypatch.delenv("CTGAN_INCEPTION_PB", raising=False)
    monkeypatch.setattr(inception2015, "_DEFAULT_LOCATIONS", ())
    with pytest.raises(FileNotFoundError, match="CTGAN_INCEPTION_PB"):
        Inception2015(str(tmp_path / "nope.pb"))


def test_rejects_small_valued_images(tmp_path, rng):
    gd, _ = _mini_inception_graphdef(rng)
    pb = tmp_path / "mini.pb"
    pb.write_bytes(gd)
    inc = Inception2015(str(pb))
    with pytest.raises(ValueError, match="0..255"):
        inc.inception_score(rng.uniform(-1, 1, size=(4, 8, 8, 3)))


def test_pick_scorer_prefers_inception_file(tmp_path, monkeypatch, rng):
    """apps.common.pick_scorer routes to the reference-comparable scorer
    when $CTGAN_INCEPTION_PB points at a weight file, and the flat-array
    adapter matches Inception2015 on the same images."""
    from ctgan_tpu.apps.common import pick_scorer

    gd, _ = _mini_inception_graphdef(rng)
    pb = tmp_path / "mini.pb"
    pb.write_bytes(gd)
    monkeypatch.setenv("CTGAN_INCEPTION_PB", str(pb))
    scorer = pick_scorer(3, 8, str(tmp_path))
    assert scorer.comparable
    flat = rng.uniform(0, 255, size=(24, 3 * 8 * 8)).astype(np.float32)
    m1, s1 = scorer.inception_score(flat, splits=3)
    direct = Inception2015(str(pb))
    m2, s2 = direct.inception_score(flat.reshape(24, 3, 8, 8), splits=3)
    assert m1 == pytest.approx(m2, rel=1e-6)


def _attr_i(i: int) -> bytes:
    return _tag(3, 0) + _varint(i)  # AttrValue.i


def _extended_ops_graphdef(rng):
    """A second mini graph exercising the op families the real 2015 graph
    plausibly contains beyond the core set: Pad, Shape->Pack->Fill,
    Slice, StridedSlice (+masks), Relu6, Mean, Rsqrt/Sqrt, arithmetic."""
    x0 = rng.normal(0, 1, size=(2, 4, 4, 3)).astype(np.float32)
    gd = b""
    gd += _const("x", x0)
    gd += _const("pad/p", np.asarray([[0, 0], [1, 1], [1, 1], [0, 0]], np.int32))
    gd += _node("pad", "Pad", ["x", "pad/p"])                       # [2,6,6,3]
    gd += _node("r6", "Relu6", ["pad"])
    gd += _const("sl/b", np.asarray([0, 1, 1, 0], np.int32))
    gd += _const("sl/s", np.asarray([-1, 4, 4, 3], np.int32))
    gd += _node("sl", "Slice", ["r6", "sl/b", "sl/s"])              # [2,4,4,3]
    gd += _const("ss/b", np.asarray([0, 0, 0, 1], np.int32))
    gd += _const("ss/e", np.asarray([0, 2, 4, 3], np.int32))
    gd += _const("ss/st", np.asarray([1, 1, 2, 1], np.int32))
    gd += _node("ss", "StridedSlice", ["sl", "ss/b", "ss/e", "ss/st"],
                attrs={"begin_mask": _attr_i(0b0001), "end_mask": _attr_i(0b1001),
                       "shrink_axis_mask": _attr_i(0)})             # [2,2,2,2]
    gd += _const("mean/ax", np.asarray([1, 2], np.int32))
    gd += _node("mean", "Mean", ["ss", "mean/ax"],
                attrs={"keep_dims": _attr_b(False)})                # [2,2]
    gd += _const("eps", np.asarray(0.5, np.float32))
    gd += _node("vplus", "Add", ["mean", "eps"])
    gd += _node("rsq", "Rsqrt", ["vplus"])
    gd += _node("sq", "Sqrt", ["vplus"])
    gd += _node("ratio", "RealDiv", ["rsq", "sq"])
    gd += _node("neg", "Neg", ["ratio"])
    gd += _node("mx", "Maximum", ["ratio", "neg"])
    gd += _node("mn", "Minimum", ["ratio", "neg"])
    gd += _node("t", "Tanh", ["mx"])
    gd += _node("sg", "Sigmoid", ["mn"])
    gd += _node("e", "Exp", ["sg"])
    gd += _node("out", "Add", ["t", "e"])                           # [2,2]
    return gd, x0


def test_executor_extended_ops_against_numpy(tmp_path, rng):
    gd, x0 = _extended_ops_graphdef(rng)
    from ctgan_tpu.eval.inception2015 import _Executor

    exe = _Executor(parse_graphdef(gd))
    out = np.asarray(exe.run("out", {}))

    pad = np.pad(x0, ((0, 0), (1, 1), (1, 1), (0, 0)))
    r6 = np.clip(pad, 0, 6)
    sl = r6[:, 1:5, 1:5, :]
    # begin_mask bit0 -> begin[0] ignored; end_mask bit3 -> end[3] ignored
    ss = sl[:, 0:2, 0:4:2, 1:]
    mean = ss.mean(axis=(1, 2))
    vplus = mean + 0.5
    ratio = (1 / np.sqrt(vplus)) / np.sqrt(vplus)
    expect = np.tanh(np.maximum(ratio, -ratio)) + np.exp(
        1 / (1 + np.exp(-np.minimum(ratio, -ratio))))
    np.testing.assert_allclose(out, expect, rtol=2e-5, atol=2e-6)


def test_executor_shape_pack_fill_shrink(rng):
    from ctgan_tpu.eval.inception2015 import _Executor

    x0 = rng.normal(size=(3, 5)).astype(np.float32)
    gd = b""
    gd += _const("x", x0)
    gd += _node("shp", "Shape", ["x"])
    gd += _const("i0", np.asarray([0], np.int32))
    gd += _const("i1", np.asarray([1], np.int32))
    gd += _const("ones", np.asarray([1], np.int32))
    # shrink both dims of Shape -> scalars, Pack them back, Fill with 7
    gd += _node("d0", "StridedSlice", ["shp", "i0", "ones", "ones"],
                attrs={"shrink_axis_mask": _attr_i(1)})
    gd += _const("two", np.asarray([2], np.int32))
    gd += _node("d1", "StridedSlice", ["shp", "i1", "two", "ones"],
                attrs={"shrink_axis_mask": _attr_i(1)})
    gd += _node("dims", "Pack", ["d0", "d1"], attrs={"axis": _attr_i(0)})
    gd += _const("seven", np.asarray(7.0, np.float32))
    gd += _node("f", "Fill", ["dims", "seven"])
    exe = _Executor(parse_graphdef(gd))
    out = np.asarray(exe.run("f", {}))
    np.testing.assert_array_equal(out, np.full((3, 5), 7.0, np.float32))


def test_unsupported_census(tmp_path, rng):
    """The census reports exactly the reachable not-implemented ops, and
    ignores unreachable ones and everything behind a fed node."""
    from ctgan_tpu.eval.inception2015 import _Executor

    gd = b""
    gd += _const("c", np.asarray(1.0, np.float32))
    gd += _node("weird", "FusedFrobnicate", ["c"])
    gd += _node("mid", "Identity", ["weird"])
    gd += _node("out", "Relu", ["mid"])
    gd += _node("dead", "AnotherUnknownOp", ["c"])  # not reachable from out
    exe = _Executor(parse_graphdef(gd))
    gaps = exe.unsupported("out")
    assert gaps == {"FusedFrobnicate": ["weird"]}
    # feeding 'mid' cuts the graph above it
    assert exe.unsupported("out", feeds=("mid",)) == {}
    names = {n.name for n in exe.reachable("out")}
    assert "dead" not in names and "weird" in names
