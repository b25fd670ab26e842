"""Third probe: is device_put's upload real (and only execute-with-numpy-args
slow), or deferred to consumption?  And can uploads overlap device compute?
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "float32")
try:
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
except Exception:
    pass


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(1)
    # consumer: touches every input byte, tiny output
    g = jax.jit(lambda im: im.astype(jnp.float32).sum())

    n = int(23e6)
    arr0 = rng.integers(0, 255, size=n, dtype=np.uint8)
    jax.block_until_ready(g(jax.device_put(arr0)))  # compile

    def consume(d):
        t0 = time.perf_counter()
        out = g(d)
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    # A. device_put + block + SLEEP, then consume
    for sleep in (0.0, 0.5, 2.0):
        arr = rng.integers(0, 255, size=n, dtype=np.uint8)
        t0 = time.perf_counter()
        d = jax.device_put(arr)
        jax.block_until_ready(d)
        t_put = time.perf_counter() - t0
        if sleep:
            time.sleep(sleep)
        t_con = consume(d)
        print(f"A sleep={sleep:3.1f}s: put+block {t_put*1e3:7.1f} ms, consume {t_con*1e3:7.1f} ms",
              flush=True)
        del d

    # B. jnp.asarray instead of device_put
    arr = rng.integers(0, 255, size=n, dtype=np.uint8)
    t0 = time.perf_counter()
    d = jnp.asarray(arr)
    jax.block_until_ready(d)
    t_put = time.perf_counter() - t0
    t_con = consume(d)
    print(f"B jnp.asarray: put+block {t_put*1e3:7.1f} ms, consume {t_con*1e3:7.1f} ms", flush=True)
    del d

    # C. direct numpy arg to jit (execute-inlined transfer)
    arr = rng.integers(0, 255, size=n, dtype=np.uint8)
    t0 = time.perf_counter()
    out = g(arr)
    jax.block_until_ready(out)
    print(f"C numpy arg:   execute+block {(time.perf_counter()-t0)*1e3:7.1f} ms", flush=True)

    # D. long compute + concurrent fresh put: does the upload overlap?
    w = jax.device_put(rng.standard_normal((8192, 8192)).astype(np.float32))
    def chain(a):
        for _ in range(24):
            a = a @ a * 1e-3
        return a.sum()
    mm = jax.jit(chain)
    jax.block_until_ready(mm(w))
    t0 = time.perf_counter()
    jax.block_until_ready(mm(w))
    t_mm = time.perf_counter() - t0
    arr = rng.integers(0, 255, size=n, dtype=np.uint8)
    t0 = time.perf_counter()
    r = mm(w)  # dispatched first, long-running
    d = jax.device_put(arr)
    jax.block_until_ready(d)
    t_d = time.perf_counter() - t0
    jax.block_until_ready(r)
    t_all = time.perf_counter() - t0
    t_con = consume(d)
    print(f"D: mm alone {t_mm*1e3:.1f} ms; put-during-mm done at {t_d*1e3:.1f} ms; "
          f"both {t_all*1e3:.1f} ms; consume-after {t_con*1e3:.1f} ms", flush=True)

    # E. repeat consumption of the SAME device array (is the slow path per-use?)
    arr = rng.integers(0, 255, size=n, dtype=np.uint8)
    d = jax.device_put(arr)
    jax.block_until_ready(d)
    for k in range(3):
        print(f"E consume #{k}: {consume(d)*1e3:7.1f} ms", flush=True)

    # F. does d2h copy_to_host_async + delayed asarray hide the fetch?
    big = jax.jit(lambda x: jnp.tile(x, 64))  # ~23 MB output
    x = jax.device_put(rng.standard_normal(int(90e3)).astype(np.float32))
    y = big(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    np.asarray(y)
    print(f"F d2h sync: {(time.perf_counter()-t0)*1e3:7.1f} ms", flush=True)
    y2 = big(x * 2)
    jax.block_until_ready(y2)
    t0 = time.perf_counter()
    y2.copy_to_host_async()
    t_async = time.perf_counter() - t0
    time.sleep(1.0)
    t1 = time.perf_counter()
    np.asarray(y2)
    print(f"F d2h async: start {t_async*1e3:.1f} ms, asarray-after-1s "
          f"{(time.perf_counter()-t1)*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
