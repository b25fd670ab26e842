"""TPU probe 7: which op inside the RANSAC gate crashes the compiler in-scan
under x64?  Candidates: batched 9x9 eigh (QDWH path), batched 3x3 svd."""

import os
import sys
import time

import jax

jax.config.update("jax_enable_x64", os.environ.get("PROBE_X64", "1") == "1")
jax.config.update("jax_default_matmul_precision", "float32")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np


def try_case(name, fn, *a):
    try:
        t0 = time.perf_counter()
        jax.block_until_ready(jax.jit(fn)(*a))
        print(f"{name}: ok {time.perf_counter()-t0:.1f}s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:100]}", flush=True)


def main():
    cases = sys.argv[1:] or ["eigh9", "svd3", "eigh9_noscan", "svd3_noscan"]
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(20, 9, 9)), jnp.float32)
    G = jnp.einsum("kij,kil->kjl", A, A)
    F3 = jnp.asarray(rng.normal(size=(20, 3, 3)), jnp.float32)

    def scan4(body, x):
        return jax.lax.scan(lambda c, _: (body(c), None), x, None, length=4)[0]

    for c in cases:
        if c == "eigh9":
            try_case("eigh9_in_scan",
                     lambda G: scan4(lambda g: jnp.linalg.eigh(g)[1] @ g, G), G)
        elif c == "svd3":
            def body(f):
                U, S, Vt = jnp.linalg.svd(f)
                S = S.at[:, 2].set(0.0)
                return jnp.einsum("kij,kj,kjl->kil", U, S, Vt)

            try_case("svd3_in_scan", lambda F: scan4(body, F), F3)
        elif c == "eigh9_noscan":
            try_case("eigh9_noscan", lambda G: jnp.linalg.eigh(G)[1], G)
        elif c == "svd3_noscan":
            try_case("svd3_noscan", lambda F: jnp.linalg.svd(F)[1], F3)


if __name__ == "__main__":
    main()
