"""TPU probe 4: bisect the remote-compiler SIGABRT on the fused chunk program.

Candidates (everything compiles standalone; the crash appears only in the
full program): production-shape f64 gram+chol in scan, weak-f64 scalar
clip/where floods, f64 sort/argsort/floor, scalar-bool scan carry.
"""

import time

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "float32")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np


def try_case(name, make_run, *args):
    try:
        t0 = time.perf_counter()
        out = jax.block_until_ready(make_run(*args))
        print(f"{name}: ok {time.perf_counter()-t0:.1f}s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    # 1. production shapes: riccati [141x435] + kailath [221x503] islands in scan
    M1 = jnp.asarray(rng.normal(size=(141, 435)), jnp.float32)
    M2 = jnp.asarray(rng.normal(size=(221, 503)), jnp.float32)

    def tria64(M):
        M64 = M.astype(jnp.float64)
        return jnp.linalg.cholesky(
            M64 @ M64.T + 500.0 * jnp.eye(M.shape[0], dtype=jnp.float64)
        ).astype(jnp.float32)

    @jax.jit
    def run_shapes(M1, M2):
        def step(carry, _):
            a, b = carry
            a = jnp.concatenate([tria64(a[:, :435]), a[:, :294]], axis=1)[:, :435]
            b = jnp.concatenate([tria64(b[:, :503]), b[:, :282]], axis=1)[:, :503]
            return (a, b), None

        return jax.lax.scan(step, (M1, M2), None, length=3)[0][0]

    try_case("prod_shape_islands_in_scan", lambda: run_shapes(M1, M2))

    # 2. weak-f64 scalar flood (clip/where with python floats under x64)
    X = jnp.asarray(rng.normal(size=(141, 141)), jnp.float32)

    @jax.jit
    def run_weak(X):
        def step(x, _):
            x = jnp.clip(x, 0.0, 78.999)
            x = jnp.where(x > 1e-9, x, 1e-12)
            x = x / jnp.clip(jnp.sum(x), 1e-30, None)
            return x * 58.999, None

        return jax.lax.scan(step, X, None, length=4)[0]

    try_case("weak_f64_scalars_in_scan", lambda: run_weak(X))

    # 3. f64 sort/argsort/floor ranking (outlier gate pattern)
    s = jnp.asarray(rng.normal(size=(40,)), jnp.float32)
    tracked = jnp.asarray(rng.uniform(size=40) > 0.3)

    @jax.jit
    def run_rank(s, tracked):
        def step(sc, _):
            score = jnp.where(tracked, 1e12 + sc, -jnp.inf)
            order = jnp.argsort(-score)
            rank = jnp.argsort(order)
            m = jnp.sum(tracked)
            mx = jnp.floor(0.8 * m).astype(rank.dtype)
            keep = rank < mx
            return jnp.where(keep, sc * 1.001, sc), None

        return jax.lax.scan(step, s, None, length=4)[0]

    try_case("rank_sort_floor_in_scan", lambda: run_rank(s, tracked))

    # 4. scalar-bool carry + packed into f32 output (searched flag pattern)
    @jax.jit
    def run_bool(X):
        def step(carry, _):
            x, flag = carry
            new_flag = jnp.sum(x) > 0
            out = jnp.concatenate([
                x[0, :3], jnp.where(True, new_flag, False).astype(x.dtype).reshape(1)
            ])
            return (x * 0.999, new_flag), out

        return jax.lax.scan(step, (X, jnp.asarray(True)), None, length=4)[1]

    try_case("bool_carry_pack_in_scan", lambda: run_bool(X))

    # 5. lax.cond detector-gate + island in same scan
    @jax.jit
    def run_cond(X):
        def heavy(x):
            return tria64(jnp.concatenate([x, x, x], axis=1)[:, :300])

        def step(x, _):
            y = jax.lax.cond(jnp.sum(x) > 0, heavy, lambda a: a[:, :141], x)
            return x * 0.999 + 0.001 * y[:141, :141], None

        return jax.lax.scan(step, X, None, length=4)[0]

    try_case("cond_plus_island_in_scan", lambda: run_cond(X))


if __name__ == "__main__":
    main()
