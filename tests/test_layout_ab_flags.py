"""Guard the layout_ab sweep arms against flag-name typos.

A misspelled libtpu flag only surfaces on the chip as a rejected arm,
wasting a queue slot; this scans the installed libtpu binary for each
flag name up front (the sweep itself still tolerates rejects)."""

import mmap
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

LIBTPU = "/opt/venv/lib/python3.12/site-packages/libtpu/libtpu.so"


def test_nchw_hint_conv_equivalence():
    """The ``nchw_hint`` arm (core/matmul.conv_dim_order) must be a pure
    layout hint: bit-identical conv/deconv outputs in either order."""
    import jax.numpy as jnp
    import numpy as np

    from ctgan_tpu.core import matmul

    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 3).astype("f4"))
    f = jnp.asarray(np.random.RandomState(1).randn(5, 5, 3, 7).astype("f4"))
    ft = jnp.asarray(np.random.RandomState(2).randn(5, 5, 7, 3).astype("f4"))
    kw = dict(padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    a_conv = matmul.conv(x, f, window_strides=(1, 1), **kw)
    a_dec = matmul.conv_transpose(x, ft, strides=(2, 2), **kw)
    matmul.conv_dim_order("NCHW")
    try:
        b_conv = matmul.conv(x, f, window_strides=(1, 1), **kw)
        b_dec = matmul.conv_transpose(x, ft, strides=(2, 2), **kw)
    finally:
        matmul.conv_dim_order("NHWC")
    np.testing.assert_array_equal(np.asarray(a_conv), np.asarray(b_conv))
    np.testing.assert_array_equal(np.asarray(a_dec), np.asarray(b_dec))
    with pytest.raises(ValueError):
        matmul.conv_dim_order("NWHC")


def test_nchw_hint_flagship_step_equivalence():
    """One tiny flagship ACGAN step traced under each conv dim order yields
    the same losses (float-reassociation tolerance — the NCHW trace may
    reduce in a different order)."""
    import jax
    import numpy as np

    from ctgan_tpu.core import matmul
    from workloads import build_workload

    def one_step(order):
        matmul.conv_dim_order(order)
        try:
            w = build_workload("resnet", tiny=True)
            state = w.init_state()
            _, m = jax.jit(w.step_fn)(state, *w.make_batch(0), jax.random.PRNGKey(0))
            return {k: float(v) for k, v in m.items()}
        finally:
            matmul.conv_dim_order("NHWC")

    a, b = one_step("NHWC"), one_step("NCHW")
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=2e-4, atol=1e-5, err_msg=k)


@pytest.mark.skipif(not os.path.exists(LIBTPU), reason="libtpu not installed")
def test_all_arm_flags_exist_in_libtpu():
    from layout_ab import ARMS

    flags = sorted(
        {f for opts in ARMS.values() if isinstance(opts, dict) for f in opts}
    )
    with open(LIBTPU, "rb") as fh:
        mm = mmap.mmap(fh.fileno(), 0, access=mmap.ACCESS_READ)
        try:
            missing = [f for f in flags if mm.find(f.encode()) == -1]
        finally:
            mm.close()
    assert not missing, f"flags absent from libtpu.so: {missing}"
