"""Per-op roofline for the filter's dominant device cost: the per-frame QR.

VERDICT r4 weak #6: "MFU 0.04% is explained but not proven workload-bound."
This measures the SAME QR shapes the fused frame program issues (the one-QR
pre-array, plus the legacy two-QR shapes) standalone on the chip, amortised
over a scan of many iterations so the tunnel dispatch cost washes out.  If
the in-program per-QR time (XLA trace) matches the standalone attainable
time, the filter runs its QRs at the rate this chip can execute them — i.e.
the low MFU is the workload's arithmetic intensity, not implementation loss.

Run on the chip (one TPU python at a time):
    python scripts/qr_roofline.py
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_default_matmul_precision", "float32")
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    except Exception:
        pass

    # shapes from the capacity-30 production filter (D = 21 + 3*30 = 111):
    #   one-QR fused frame:   pre-array [171, 294+60] (m=60, W=2D+12 + m)
    #   legacy Riccati tria:  [111, 345]  (W=3D+12)
    #   legacy update tria:   [171, 282]  (m+D, m+2D)
    shapes = {
        "fused_one_qr": (171, 354),
        "legacy_riccati": (111, 345),
        "legacy_update": (171, 282),
    }
    iters = 200
    out = {}
    for name, (r, c) in shapes.items():
        key = jax.random.PRNGKey(0)
        M = jax.random.normal(key, (r, c), dtype=jnp.float32)

        @jax.jit
        def many(M):
            def body(carry, _):
                R = jnp.linalg.qr(carry.T, mode="r")
                # feed the result back (shape [c, r] -> rebuild [r, c]) so the
                # compiler cannot hoist or dedupe the QRs
                carry = carry.at[:, : R.shape[0]].add(0.001 * R.T[: carry.shape[0]])
                return carry, R[0, 0]
            return jax.lax.scan(body, M, None, length=iters)

        r0 = many(M)
        jax.block_until_ready(r0)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(many(M))
            best = min(best, time.perf_counter() - t0)
        per_qr_us = best / iters * 1e6
        # Householder QR flop count ~ 2mn^2 - 2n^3/3 for m x n (n<=m): here
        # QR of M.T [c, r]
        flops = 2 * c * r * r - 2 * r**3 / 3
        out[name] = {
            "shape": [r, c],
            "standalone_us_per_qr": round(per_qr_us, 1),
            "gflops_at_that_rate": round(flops / (per_qr_us * 1e-6) / 1e9, 2),
        }
        print(name, out[name], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
