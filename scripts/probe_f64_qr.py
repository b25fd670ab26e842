"""TPU probe: does the tunnel compile/run f64 QR (the f64-island tria), and
what does it cost vs f32 at the production shapes?  One TPU process only."""

import time

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "float32")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np


def main():
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)
    D = 141  # 21 + 3*40 (EuRoC maxFeatures)
    for name, K, dt in [
        ("riccati_f32", D + D + 12 + D, jnp.float32),
        ("riccati_f64", D + D + 12 + D, jnp.float64),
        ("kailath_f32", 2 * 40 + 2 * D, jnp.float32),
        ("kailath_f64", 2 * 40 + 2 * D, jnp.float64),
    ]:
        M = jnp.asarray(np.random.default_rng(0).normal(size=(D, K)), dtype=dt)

        @jax.jit
        def f(M):
            R = jnp.linalg.qr(M.T, mode="r")
            return R.T

        try:
            t0 = time.perf_counter()
            out = jax.block_until_ready(f(M))
            t_compile = time.perf_counter() - t0
            best = min(
                (lambda: (lambda t: (jax.block_until_ready(f(M)), time.perf_counter() - t)[1])(time.perf_counter()))()
                for _ in range(20)
            )
            err = float(jnp.max(jnp.abs(out @ out.T - M @ M.T)))
            print(f"{name}: ok compile={t_compile:.1f}s best={best*1e3:.3f}ms "
                  f"recon_err={err:.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {e}", flush=True)

    # mixed program: f32 factor, f64 island inside (the production pattern)
    M32 = jnp.asarray(np.random.default_rng(1).normal(size=(D, 2 * D + 12)), jnp.float32)

    @jax.jit
    def island(M):
        R = jnp.linalg.qr(M.astype(jnp.float64).T, mode="r")
        return R.T.astype(jnp.float32)

    try:
        t0 = time.perf_counter()
        jax.block_until_ready(island(M32))
        print(f"island_f32->f64->f32: ok compile={time.perf_counter()-t0:.1f}s", flush=True)
        best = 1e9
        for _ in range(20):
            t0 = time.perf_counter()
            jax.block_until_ready(island(M32))
            best = min(best, time.perf_counter() - t0)
        print(f"island best={best*1e3:.3f}ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"island: FAIL {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
