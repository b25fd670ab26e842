"""TPU probe 2: cost of f64 Cholesky + f64 Gram matmul at production shapes
(the chol-based tria alternative to the 35 ms f64 QR), plus timing-noise
check on the f32 QR (probe 1's kailath_f32 22 ms looked like tunnel noise)."""

import time

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "float32")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np


def bench(name, fn, *args, reps=30):
    try:
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        t_compile = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            times.append(time.perf_counter() - t0)
        times.sort()
        med = times[len(times) // 2]
        print(f"{name}: ok compile={t_compile:.1f}s best={times[0]*1e3:.3f}ms "
              f"med={med*1e3:.3f}ms", flush=True)
        return out
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {e}", flush=True)
        return None


def main():
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)
    D, K = 141, 423
    rng = np.random.default_rng(0)
    M32 = jnp.asarray(rng.normal(size=(D, K)), jnp.float32)

    qr32 = jax.jit(lambda M: jnp.linalg.qr(M.T, mode="r").T)
    bench("qr_f32_141x423", qr32, M32)

    # chol-based tria with f64 Gram + f64 chol, f32 in/out
    def chol_tria(M):
        G = M.astype(jnp.float64) @ M.astype(jnp.float64).T
        L = jnp.linalg.cholesky(G)
        return L.astype(jnp.float32)

    ct = jax.jit(chol_tria)
    out = bench("cholTria_f64_141", ct, M32)
    if out is not None:
        G32 = np.asarray(M32, np.float64) @ np.asarray(M32, np.float64).T
        err = float(np.max(np.abs(np.asarray(out, np.float64) @ np.asarray(out, np.float64).T - G32)))
        print(f"  recon err {err:.2e}", flush=True)

    bench("matmul_f64_141x423", jax.jit(lambda M: M.astype(jnp.float64) @ M.astype(jnp.float64).T), M32)
    bench("chol_f64_141", jax.jit(lambda G: jnp.linalg.cholesky(G)),
          jnp.asarray(np.asarray(M32 @ M32.T, np.float64)))
    bench("chol_f32_141", jax.jit(lambda G: jnp.linalg.cholesky(G)),
          M32 @ M32.T)
    # triangular solve f64 (Kailath Gamma path if needed)
    L64 = jnp.asarray(np.linalg.cholesky(np.asarray(M32 @ M32.T, np.float64) + 1e-3 * np.eye(D)))
    b64 = jnp.asarray(rng.normal(size=(D,)))
    bench("trisolve_f64_141", jax.jit(
        lambda L, b: jax.scipy.linalg.solve_triangular(L, b, lower=True)), L64, b64)


if __name__ == "__main__":
    main()
