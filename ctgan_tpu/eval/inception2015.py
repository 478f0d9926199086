"""Inception-2015 Inception Score — file-based, TF-free, runs on TPU.

Reproduces the exact protocol of the reference's
``tflib/inception_score.py:25-97``: load the frozen Inception-2015 graph
(``classify_image_graph_def.pb`` from ``inception-2015-12-05.tgz``), feed
float images valued 0..255 at the ``ExpandDims`` node, read ``pool_3``,
multiply by the softmax weight matrix (input 1 of ``softmax/logits/MatMul``,
NO bias — the reference drops it), softmax over the 1008 classes, then
exp-KL over 10 splits.

Zero egress means we cannot download the 100MB tgz; instead this module
accepts a locally-supplied file (path argument, ``$CTGAN_INCEPTION_PB``, or
the reference's own cache location ``/tmp/imagenet``).  The frozen graph is
executed by a small JAX interpreter over its op set — faithful by
construction, jitted and batched on the TPU.  Scores produced this way are
directly comparable to the reference's published IS=5.13/5.20 artifacts.

FID over the same ``pool_3`` features is also provided.
"""

from __future__ import annotations

import os
import tarfile
from typing import Callable

import numpy as np

from .graphdef import NodeDef, parse_graphdef, tensor_to_numpy
from .metrics import fid_from_features, inception_score_from_probs

__all__ = ["Inception2015", "find_inception_file", "load_graphdef_bytes"]

_DEFAULT_LOCATIONS = (
    "/tmp/imagenet/classify_image_graph_def.pb",  # reference cache path
    "/tmp/imagenet/inception-2015-12-05.tgz",
    "weights/classify_image_graph_def.pb",
    "weights/inception-2015-12-05.tgz",
)


def find_inception_file(path: str | None = None) -> str | None:
    """Resolve a user-supplied Inception-2015 weight file (.pb or .tgz)."""
    cands = [path] if path else []
    env = os.environ.get("CTGAN_INCEPTION_PB")
    if env:
        cands.append(env)
    cands += list(_DEFAULT_LOCATIONS)
    for c in cands:
        if c and os.path.exists(c):
            return c
    return None


def load_graphdef_bytes(path: str) -> bytes:
    """Read a GraphDef from a .pb, or extract it from the distribution .tgz."""
    if path.endswith((".tgz", ".tar.gz")):
        with tarfile.open(path, "r:gz") as tf_:
            for member in tf_.getmembers():
                if member.name.endswith("classify_image_graph_def.pb"):
                    f = tf_.extractfile(member)
                    assert f is not None
                    return f.read()
        raise FileNotFoundError(f"no classify_image_graph_def.pb inside {path}")
    with open(path, "rb") as f:
        return f.read()


def _same_pad(in_size: int, stride: int, ksize: int) -> tuple[int, int]:
    out = -(-in_size // stride)
    pad = max(0, (out - 1) * stride + ksize - in_size)
    return pad // 2, pad - pad // 2


# Every op ``_Executor.run`` can evaluate.  ``tools/calibrate_inception.py``
# checks a user-supplied graph against this set BEFORE execution so coverage
# gaps surface as a named report, not a mid-eval crash.
SUPPORTED_OPS = frozenset({
    "Const", "Identity", "CheckNumerics", "StopGradient",
    "PlaceholderWithDefault", "ExpandDims", "Cast", "ResizeBilinear",
    "Sub", "Mul", "Add", "AddV2", "BiasAdd", "Conv2D",
    "BatchNormWithGlobalNormalization", "Relu", "Relu6", "MaxPool",
    "AvgPool", "Concat", "ConcatV2", "MatMul", "Reshape", "Squeeze",
    "Softmax", "Pad", "Shape", "StridedSlice", "Slice", "Pack", "Fill",
    "Rsqrt", "Sqrt", "Maximum", "Minimum", "RealDiv", "Div", "Neg",
    "Exp", "Tanh", "Sigmoid", "Mean",
})


class _Executor:
    """Interprets the frozen graph's op set with jax.numpy/lax ops.

    Op coverage is the Inception-2015 family (plus close relatives); an
    unknown op raises with its name so gaps are obvious, not silent.
    """

    def __init__(self, nodes: list[NodeDef]):
        self.nodes = {n.name: n for n in nodes}
        self.consts: dict[str, np.ndarray] = {
            n.name: tensor_to_numpy(n.attrs["value"].tensor)
            for n in nodes
            if n.op == "Const"
        }

    def reachable(self, target: str, feeds: tuple = ()) -> list[NodeDef]:
        """All nodes evaluated for ``target`` given ``feeds`` overridden —
        the exact execution frontier (fed nodes' inputs are NOT visited)."""
        fed = {self._base(f) for f in feeds}
        seen: dict[str, NodeDef] = {}
        stack = [self._base(target)]
        while stack:
            name = stack.pop()
            if name in seen or name in fed:
                continue
            node = self.nodes[name]
            seen[name] = node
            stack.extend(self._base(i) for i in node.inputs)
        return list(seen.values())

    def unsupported(self, target: str, feeds: tuple = ()) -> dict[str, list[str]]:
        """op -> node names for reachable ops outside SUPPORTED_OPS."""
        gaps: dict[str, list[str]] = {}
        for n in self.reachable(target, feeds):
            if n.op not in SUPPORTED_OPS:
                gaps.setdefault(n.op, []).append(n.name)
        return gaps

    def const(self, name: str) -> np.ndarray:
        return self.consts[self._base(name)]

    @staticmethod
    def _base(ref: str) -> str:
        ref = ref.lstrip("^")
        return ref.split(":")[0]

    def run(self, target: str, feeds: dict[str, "object"]) -> "object":
        """Evaluate node ``target``, with ``feeds`` overriding named nodes'
        outputs (the reference feeds 'ExpandDims:0')."""
        import jax.numpy as jnp
        from jax import lax

        cache: dict[str, object] = {self._base(k): v for k, v in feeds.items()}

        def attr(node, key, default=None):
            a = node.attrs.get(key)
            return a if a is not None else default

        def value(ref):
            name = self._base(ref)
            if name in cache:
                return cache[name]
            node = self.nodes[name]
            out = compute(node)
            cache[name] = out
            return out

        def conv2d(node):
            x = value(node.inputs[0])
            w = jnp.asarray(self.const(node.inputs[1]))  # HWIO
            strides = attr(node, "strides").list_i
            padding = attr(node, "padding").s.decode()
            dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
            return lax.conv_general_dilated(
                x, w, window_strides=strides[1:3], padding=padding,
                dimension_numbers=dn,
            )

        def pool(node, reducer, init, avg=False):
            x = value(node.inputs[0])
            ks = attr(node, "ksize").list_i
            st = attr(node, "strides").list_i
            padding = attr(node, "padding").s.decode()
            if padding == "SAME":
                pads = [(0, 0)] + [
                    _same_pad(x.shape[i], st[i], ks[i]) for i in (1, 2)
                ] + [(0, 0)]
            else:
                pads = [(0, 0)] * 4
            out = lax.reduce_window(x, init, reducer, ks, st, pads)
            if avg:
                ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
                counts = lax.reduce_window(
                    ones, 0.0, lax.add, ks[:3] + [1], st[:3] + [1], pads[:3] + [(0, 0)]
                )
                out = out / counts
            return out

        def compute(node):
            op = node.op
            if op == "Const":
                return jnp.asarray(self.consts[node.name])
            if op in ("Identity", "CheckNumerics", "StopGradient", "PlaceholderWithDefault"):
                return value(node.inputs[0])
            if op == "Placeholder":
                raise KeyError(
                    f"placeholder {node.name!r} not fed (feeds: bind its consumer)"
                )
            if op == "ExpandDims":
                return jnp.expand_dims(
                    value(node.inputs[0]), int(self.const(node.inputs[1]))
                )
            if op == "Cast":
                dst = attr(node, "DstT").type
                np_dt = {1: jnp.float32, 3: jnp.int32, 4: jnp.uint8, 9: jnp.int64}[dst]
                return value(node.inputs[0]).astype(np_dt)
            if op == "ResizeBilinear":
                x = value(node.inputs[0])
                size = self.const(node.inputs[1]).astype(int)
                # TF default align_corners=False == jax.image 'linear' with
                # half_pixel... TF1's resize (align_corners=False) uses
                # scale = in/out and src = out_idx * scale (NOT half-pixel).
                import jax

                b, _h, _w, c = x.shape
                return _tf_resize_bilinear(jnp, x, int(size[0]), int(size[1]))
            if op == "Sub":
                return value(node.inputs[0]) - value(node.inputs[1])
            if op == "Mul":
                return value(node.inputs[0]) * value(node.inputs[1])
            if op in ("Add", "AddV2", "BiasAdd"):
                return value(node.inputs[0]) + value(node.inputs[1])
            if op == "Conv2D":
                return conv2d(node)
            if op == "BatchNormWithGlobalNormalization":
                t = value(node.inputs[0])
                m = value(node.inputs[1])
                v = value(node.inputs[2])
                beta = value(node.inputs[3])
                gamma = value(node.inputs[4])
                eps = attr(node, "variance_epsilon").f
                scale_after = attr(node, "scale_after_normalization")
                inv = lax.rsqrt(v + eps)
                if scale_after is not None and scale_after.b:
                    inv = inv * gamma
                return t * inv + (beta - m * inv)
            if op == "Relu":
                return jnp.maximum(value(node.inputs[0]), 0)
            if op == "Relu6":
                return jnp.clip(value(node.inputs[0]), 0, 6)
            if op == "Pad":
                x = value(node.inputs[0])
                pads = np.asarray(self.const(node.inputs[1])).astype(int)
                return jnp.pad(x, [tuple(p) for p in pads])
            if op == "Shape":
                return np.asarray(value(node.inputs[0]).shape, np.int32)
            if op == "Fill":
                dims = np.asarray(value(node.inputs[0])).astype(int)
                return jnp.full(tuple(dims), value(node.inputs[1]))
            if op == "Pack":
                axis_a = attr(node, "axis")
                axis = axis_a.i if axis_a is not None else 0
                return jnp.stack([jnp.asarray(value(i)) for i in node.inputs], axis=axis)
            if op == "Slice":
                x = value(node.inputs[0])
                begin = np.asarray(self.const(node.inputs[1])).astype(int)
                size = np.asarray(self.const(node.inputs[2])).astype(int)
                idx = tuple(
                    slice(b, x.shape[d] if s == -1 else b + s)
                    for d, (b, s) in enumerate(zip(begin, size))
                )
                return x[idx]
            if op == "StridedSlice":
                # const begin/end/strides with begin/end/shrink masks — the subset
                # frozen inference graphs use (no ellipsis/new-axis masks)
                x = value(node.inputs[0])
                begin = np.asarray(self.const(node.inputs[1])).astype(int)
                end = np.asarray(self.const(node.inputs[2])).astype(int)
                strides = np.asarray(self.const(node.inputs[3])).astype(int)
                bm = attr(node, "begin_mask")
                em = attr(node, "end_mask")
                sm = attr(node, "shrink_axis_mask")
                bm = bm.i if bm is not None else 0
                em = em.i if em is not None else 0
                sm = sm.i if sm is not None else 0
                idx = []
                for d in range(len(begin)):
                    if sm & (1 << d):
                        idx.append(int(begin[d]))
                        continue
                    b = None if bm & (1 << d) else int(begin[d])
                    e = None if em & (1 << d) else int(end[d])
                    idx.append(slice(b, e, int(strides[d])))
                return x[tuple(idx)]
            if op == "Rsqrt":
                return lax.rsqrt(value(node.inputs[0]))
            if op == "Sqrt":
                return jnp.sqrt(value(node.inputs[0]))
            if op == "Maximum":
                return jnp.maximum(value(node.inputs[0]), value(node.inputs[1]))
            if op == "Minimum":
                return jnp.minimum(value(node.inputs[0]), value(node.inputs[1]))
            if op in ("RealDiv", "Div"):
                return value(node.inputs[0]) / value(node.inputs[1])
            if op == "Neg":
                return -value(node.inputs[0])
            if op == "Exp":
                return jnp.exp(value(node.inputs[0]))
            if op == "Tanh":
                return jnp.tanh(value(node.inputs[0]))
            if op == "Sigmoid":
                import jax

                return jax.nn.sigmoid(value(node.inputs[0]))
            if op == "Mean":
                axes = tuple(np.asarray(self.const(node.inputs[1])).ravel().astype(int))
                keep = attr(node, "keep_dims")
                return jnp.mean(
                    value(node.inputs[0]), axis=axes,
                    keepdims=bool(keep.b) if keep is not None else False,
                )
            if op == "MaxPool":
                return pool(node, lax.max, -jnp.inf)
            if op == "AvgPool":
                return pool(node, lax.add, 0.0, avg=True)
            if op in ("Concat", "ConcatV2"):
                if op == "Concat":  # dim is input 0
                    axis = int(self.const(node.inputs[0]))
                    vals = [value(i) for i in node.inputs[1:]]
                else:  # axis is the last input
                    axis = int(self.const(node.inputs[-1]))
                    vals = [value(i) for i in node.inputs[:-1]]
                return jnp.concatenate(vals, axis=axis)
            if op == "MatMul":
                a = value(node.inputs[0])
                b = value(node.inputs[1])
                if attr(node, "transpose_a") and attr(node, "transpose_a").b:
                    a = a.T
                if attr(node, "transpose_b") and attr(node, "transpose_b").b:
                    b = b.T
                return a @ b
            if op == "Reshape":
                shape = [int(s) for s in np.asarray(self.const(node.inputs[1])).ravel()]
                return value(node.inputs[0]).reshape(shape)
            if op == "Squeeze":
                x = value(node.inputs[0])
                dims = attr(node, "squeeze_dims")
                if dims and dims.list_i:
                    return jnp.squeeze(x, axis=tuple(dims.list_i))
                return jnp.squeeze(x)
            if op == "Softmax":
                import jax

                return jax.nn.softmax(value(node.inputs[0]), axis=-1)
            raise NotImplementedError(
                f"GraphDef op {op!r} (node {node.name!r}) not implemented"
            )

        return value(target)


def _tf_resize_bilinear(jnp, x, out_h: int, out_w: int):
    """TF1 ResizeBilinear with align_corners=False: src = dst * (in/out),
    clamped; NOT half-pixel centers (that's TF2/jax.image default)."""
    b, in_h, in_w, c = x.shape
    if (in_h, in_w) == (out_h, out_w):
        return x

    def axis_weights(in_size, out_size):
        scale = in_size / out_size
        src = np.arange(out_size, dtype=np.float64) * scale
        lo = np.floor(src).astype(np.int32)
        hi = np.minimum(lo + 1, in_size - 1)
        frac = (src - lo).astype(np.float32)
        return lo, hi, frac

    ylo, yhi, yf = axis_weights(in_h, out_h)
    xlo, xhi, xf = axis_weights(in_w, out_w)
    yf = jnp.asarray(yf)[None, :, None, None]
    xf = jnp.asarray(xf)[None, None, :, None]
    top = x[:, ylo][:, :, xlo] * (1 - xf) + x[:, ylo][:, :, xhi] * xf
    bot = x[:, yhi][:, :, xlo] * (1 - xf) + x[:, yhi][:, :, xhi] * xf
    return top * (1 - yf) + bot * yf


class Inception2015:
    """Inception-2015 scorer over a user-supplied frozen graph file.

    >>> inc = Inception2015("/tmp/imagenet/inception-2015-12-05.tgz")
    >>> mean, std = inc.inception_score(images)   # uint8-valued, NHWC or NCHW
    """

    FEED = "ExpandDims"        # reference feeds 'ExpandDims:0' (:45)
    POOL = "pool_3"            # 2048-d features (:80)
    LOGITS_W = "softmax/logits/MatMul"  # weight = inputs[1] (:95)

    def __init__(self, path: str | None = None, batch_size: int = 100):
        resolved = find_inception_file(path)
        if resolved is None:
            raise FileNotFoundError(
                "Inception-2015 weights not found. Supply "
                "classify_image_graph_def.pb or inception-2015-12-05.tgz via "
                "the path argument, $CTGAN_INCEPTION_PB, or /tmp/imagenet/. "
                "(Download: http://download.tensorflow.org/models/image/"
                "imagenet/inception-2015-12-05.tgz)"
            )
        nodes = parse_graphdef(load_graphdef_bytes(resolved))
        self.exe = _Executor(nodes)
        self.batch_size = batch_size
        self.w = np.asarray(self.exe.const(self.exe.nodes[self.LOGITS_W].inputs[1]))
        self._jit_fwd = None

    def _forward(self):
        if self._jit_fwd is None:
            import jax
            import jax.numpy as jnp

            def fwd(batch):  # [B,H,W,3] float 0..255
                pool3 = self.exe.run(self.POOL, {self.FEED: batch})
                feats = pool3.reshape(pool3.shape[0], -1)
                logits = feats @ jnp.asarray(self.w)
                return feats, jax.nn.softmax(logits, axis=-1)

            self._jit_fwd = jax.jit(fwd)
        return self._jit_fwd

    def _to_nhwc_batches(self, images) -> np.ndarray:
        arr = np.asarray(images, np.float32)
        if arr.ndim != 4:
            raise ValueError(f"expected [N,H,W,3] or [N,3,H,W], got {arr.shape}")
        if arr.shape[1] == 3 and arr.shape[-1] != 3:
            arr = arr.transpose(0, 2, 3, 1)
        if arr.max() <= 10.0:
            raise ValueError("images must be valued 0..255 (reference :29)")
        return arr

    def predictions(self, images) -> tuple[np.ndarray, np.ndarray]:
        """(pool3 features [N,2048], softmax preds [N,1008])."""
        arr = self._to_nhwc_batches(images)
        fwd = self._forward()
        feats, preds = [], []
        bs = self.batch_size
        pad = (-len(arr)) % bs
        padded = np.concatenate([arr, arr[:pad]]) if pad else arr
        for i in range(0, len(padded), bs):
            f, p = fwd(padded[i : i + bs])
            feats.append(np.asarray(f))
            preds.append(np.asarray(p))
        feats = np.concatenate(feats)[: len(arr)]
        preds = np.concatenate(preds)[: len(arr)]
        return feats, preds

    def inception_score(self, images, splits: int = 10) -> tuple[float, float]:
        """Exact reference protocol (tflib/inception_score.py:25-53)."""
        _, preds = self.predictions(images)
        return inception_score_from_probs(preds, splits=splits)

    def fid(self, real_images, fake_images) -> float:
        rf, _ = self.predictions(real_images)
        ff, _ = self.predictions(fake_images)
        return fid_from_features(rf, ff)
