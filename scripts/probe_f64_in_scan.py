"""TPU probe 3: which f64 ops survive the remote compiler INSIDE lax.scan?

The fused chunk program with the f64-island chol tria SIGABRTs the
tpu_compile_helper (shape.h:836 Check failed: buffer != nullptr).  Bisect:
scan bodies with (a) f64 matmul, (b) f64 cholesky, (c) f64 qr, (d) the full
island, (e) f32 control.
"""

import time

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "float32")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np


def try_case(name, body):
    M0 = jnp.asarray(np.random.default_rng(0).normal(size=(64, 150)), jnp.float32)

    @jax.jit
    def run(M):
        def step(carry, _):
            return body(carry), None

        out, _ = jax.lax.scan(step, M, None, length=4)
        return out

    try:
        t0 = time.perf_counter()
        out = jax.block_until_ready(run(M0))
        ok = bool(jnp.all(jnp.isfinite(out)))
        print(f"{name}: ok finite={ok} compile+run={time.perf_counter()-t0:.1f}s",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:140]}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)

    try_case("f32_control", lambda M: M + 0.001 * M)

    def f64_matmul(M):
        G = M.astype(jnp.float64) @ M.astype(jnp.float64).T
        return M + 1e-12 * G[:, :1].astype(jnp.float32)

    try_case("f64_matmul_in_scan", f64_matmul)

    def f64_chol(M):
        G = M.astype(jnp.float64) @ M.astype(jnp.float64).T
        L = jnp.linalg.cholesky(G + 150.0 * jnp.eye(64, dtype=jnp.float64))
        return jnp.concatenate([L.astype(jnp.float32), M[:, 64:]], axis=1)

    try_case("f64_gram_chol_in_scan", f64_chol)

    def f32_chol(M):
        G = M @ M.T
        L = jnp.linalg.cholesky(G + 150.0 * jnp.eye(64, dtype=jnp.float32))
        return jnp.concatenate([L, M[:, 64:]], axis=1)

    try_case("f32_gram_chol_in_scan", f32_chol)

    def f64_qr(M):
        R = jnp.linalg.qr(M.astype(jnp.float64).T, mode="r")
        return jnp.concatenate([R.T.astype(jnp.float32), M[:, 64:]], axis=1)

    try_case("f64_qr_in_scan", f64_qr)


if __name__ == "__main__":
    main()
