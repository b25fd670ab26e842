"""Probe the tunneled TPU's dispatch/transfer costs.

The round-2 headline (34.4 full-frame fps) was dominated by ~600 ms per
16-frame chunk of host<->device overhead.  This probe separates:

1. null-dispatch round trip (tiny jit, block)    -> fixed RPC latency
2. host->device transfer time vs payload size    -> bandwidth + per-call cost
3. device_put asynchrony                         -> can transfers overlap compute?
4. output fetch cost vs size                     -> device->host path

Run (claims the TPU grant — one at a time):
    timeout 1800 python scripts/probe_tunnel.py
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
    dev = jax.devices()[0]
    print(f"backend={jax.default_backend()} device={dev}")

    # 1. null dispatch round trip
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    jax.block_until_ready(f(x))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        ts.append(time.perf_counter() - t0)
    print(f"null dispatch+block: min {min(ts)*1e3:.2f} ms  med {sorted(ts)[5]*1e3:.2f} ms")

    # 2. host->device transfer vs size (uint8, like image chunks)
    for mb in (0.36, 1.4, 5.8, 23, 46, 92):
        n = int(mb * 1e6)
        arr = np.random.randint(0, 255, size=n, dtype=np.uint8)
        jax.block_until_ready(jax.device_put(arr))  # warm path
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            d = jax.device_put(arr)
            t_ret = time.perf_counter() - t0
            jax.block_until_ready(d)
            t_done = time.perf_counter() - t0
            ts.append((t_ret, t_done))
            del d
        best = min(t[1] for t in ts)
        ret = min(t[0] for t in ts)
        print(
            f"h2d {mb:6.2f} MB: put-returns {ret*1e3:7.1f} ms, "
            f"complete {best*1e3:7.1f} ms -> {mb/best:7.1f} MB/s"
        )

    # 3. does an in-flight transfer overlap device compute?
    big = np.random.randint(0, 255, size=int(23e6), dtype=np.uint8)
    w = jnp.asarray(np.random.randn(2048, 2048), jnp.float32)
    mm = jax.jit(lambda a: a @ a)
    jax.block_until_ready(mm(w))
    t0 = time.perf_counter()
    jax.block_until_ready(mm(w))
    t_mm = time.perf_counter() - t0
    t0 = time.perf_counter()
    d = jax.device_put(big)
    r = mm(w)
    jax.block_until_ready((d, r))
    t_both = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(jax.device_put(big))
    t_put = time.perf_counter() - t0
    print(
        f"overlap: matmul {t_mm*1e3:.1f} ms, 23MB put {t_put*1e3:.1f} ms, "
        f"both {t_both*1e3:.1f} ms (overlap if ~max, serial if ~sum)"
    )

    # 4. device->host fetch vs size
    for mb in (0.1, 1.4, 23):
        n = int(mb * 1e6)
        d = jax.device_put(np.zeros(n, np.uint8))
        jax.block_until_ready(d)
        np.asarray(d)  # warm
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(d)
            ts.append(time.perf_counter() - t0)
        print(f"d2h {mb:6.2f} MB: {min(ts)*1e3:7.1f} ms -> {mb/min(ts):7.1f} MB/s")

    # 5. many small puts vs one big put (per-call overhead)
    small = [np.random.randint(0, 255, size=int(0.36e6), dtype=np.uint8) for _ in range(16)]
    jax.block_until_ready([jax.device_put(s) for s in small])
    t0 = time.perf_counter()
    ds = [jax.device_put(s) for s in small]
    jax.block_until_ready(ds)
    t_many = time.perf_counter() - t0
    print(f"16x 0.36MB puts: {t_many*1e3:.1f} ms (vs one 5.8MB put above)")


if __name__ == "__main__":
    main()
