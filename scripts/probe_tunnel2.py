"""Second tunnel probe: FRESH arrays per measurement (the axon backend caches
repeat device_put of the same host buffer, which polluted probe 1), and
computed outputs for d2h (device_put'd arrays keep a free host copy).
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
    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)

    # 1. h2d with FRESH arrays each time
    for mb in (0.36, 1.4, 5.8, 11.6, 23, 46):
        n = int(mb * 1e6)
        ts = []
        for _ in range(4):
            arr = rng.integers(0, 255, size=n, dtype=np.uint8)  # fresh buffer
            t0 = time.perf_counter()
            d = jax.device_put(arr)
            jax.block_until_ready(d)
            ts.append(time.perf_counter() - t0)
            del d
        best = min(ts)
        print(f"h2d fresh {mb:6.2f} MB: {best*1e3:7.1f} ms -> {mb/best:7.1f} MB/s "
              f"(all: {[round(t*1e3) for t in ts]})", flush=True)

    # 2. d2h of COMPUTED outputs
    f = jax.jit(lambda x: x * 2 + 1)
    for mb in (0.36, 5.8, 23):
        n = int(mb * 1e6 // 4)
        x = jax.device_put(rng.standard_normal(n).astype(np.float32))
        ts = []
        for _ in range(4):
            y = f(x)
            jax.block_until_ready(y)
            t0 = time.perf_counter()
            np.asarray(y)
            ts.append(time.perf_counter() - t0)
            del y
        print(f"d2h computed {mb:6.2f} MB: {min(ts)*1e3:7.1f} ms -> {mb/min(ts):7.1f} MB/s",
              flush=True)

    # 3. end-to-end: jit step with a fresh big input (the chunk pattern):
    # fresh uint8 images in, small outputs back
    g = jax.jit(lambda im: (im.astype(jnp.float32).mean(), im[..., :2].sum()))
    for mb, shape in ((5.8, (16, 480, 752)), (23, (64, 480, 752)), (46, (128, 480, 752))):
        ts_disp, ts_tot = [], []
        for _ in range(4):
            arr = rng.integers(0, 255, size=shape, dtype=np.uint8)
            t0 = time.perf_counter()
            out = g(arr)
            t1 = time.perf_counter()
            jax.block_until_ready(out)
            np.asarray(out[0])
            t2 = time.perf_counter()
            ts_disp.append(t1 - t0)
            ts_tot.append(t2 - t0)
        print(f"jit(fresh {mb:5.1f} MB in): dispatch-returns {min(ts_disp)*1e3:7.1f} ms, "
              f"total {min(ts_tot)*1e3:7.1f} ms", flush=True)

    # 4. does a fresh-array device_put overlap a running computation?
    w = jax.device_put(rng.standard_normal((4096, 4096)).astype(np.float32))
    mm = jax.jit(lambda a: ((a @ a) @ a) @ a)
    jax.block_until_ready(mm(w))
    t0 = time.perf_counter()
    jax.block_until_ready(mm(w))
    t_mm = time.perf_counter() - t0
    arr = rng.integers(0, 255, size=int(23e6), dtype=np.uint8)
    t0 = time.perf_counter()
    r = mm(w)
    d = jax.device_put(arr)
    jax.block_until_ready((r, d))
    t_both = time.perf_counter() - t0
    print(f"overlap fresh put: matmul-chain {t_mm*1e3:.1f} ms, both {t_both*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
