"""TPU probe 5: compile the REAL pipeline pieces to find what SIGABRTs the
remote compiler (stage runners from run_opt, then the full fused chunk).

Usage: python scripts/probe_fused_bisect.py [stage ...]
  stages: prop corr feat full   (default: all, in that order)
"""

import sys
import time

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "float32")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np


def main():
    stages = sys.argv[1:] or ["prop", "corr", "feat", "full"]
    from eqvio_tpu import filter as F
    from eqvio_tpu.app.run_opt import (
        _make_chunk_runner,
        _make_stage_runners,
        _meta_width,
        camera_from_info,
    )
    from eqvio_tpu.data import create_dataset_reader
    from eqvio_tpu.frontend import tracker_init
    from eqvio_tpu.io import load_config, settings_from_config, tracker_config_from_config

    cfg = load_config("configs/config_racing_proxy.yaml")
    settings = settings_from_config(cfg)
    settings = F.Settings(**{**settings.__dict__, "sqrt_covariance": True})
    tcfg = tracker_config_from_config(cfg)
    reader = create_dataset_reader(
        "uzhfpv", "/tmp/eqvio_proxies/racing",
        "/tmp/eqvio_proxies/racing/camchain-imucam.yaml",
    )
    camera = camera_from_info(reader.camera, jnp.float32)
    K, C = 24, 4
    dtype = jnp.float32
    N = tcfg.max_features
    state = F.init_state(settings, N, dtype)
    trk = tracker_init(tcfg, (480, 640), dtype=jnp.float32)
    rng = np.random.default_rng(0)

    feat_scan, feat_full, feat_skip, prop_scan, pre_scan, corr_scan = \
        _make_stage_runners(tcfg, settings, settings.suite, camera, K, dtype)

    imgs_u8 = jnp.asarray(rng.integers(0, 255, size=(C, 480, 640)), jnp.uint8)
    stamps_w = jnp.asarray(np.tile(np.linspace(0, 0.046, K), (C, 1)), dtype)
    gyr = jnp.asarray(rng.normal(size=(C, K, 3)) * 0.01, dtype)
    acc = jnp.asarray(rng.normal(size=(C, K, 3)) * 0.01 + [0, 0, 9.81], dtype)
    dts = jnp.full((C, K), 0.002, dtype)
    pix = jnp.asarray(rng.uniform(50, 400, size=(C, N, 2)), jnp.float32)
    vis = jnp.ones((C, N), bool)
    ids = jnp.tile(jnp.arange(N, dtype=jnp.int32), (C, 1))

    def try_case(name, fn, *a):
        try:
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*a))
            print(f"{name}: ok {time.perf_counter()-t0:.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:140]}", flush=True)

    for st in stages:
        if st == "prop":
            try_case("prop_scan", prop_scan, state, stamps_w, gyr, acc, dts)
        elif st == "corr":
            try_case("corr_scan", corr_scan, state, stamps_w, gyr, acc, dts,
                     pix, vis, ids)
        elif st == "feat":
            try_case("feat_scan", feat_scan, trk, imgs_u8)
        elif st == "full":
            run_chunk = _make_chunk_runner(tcfg, settings, settings.suite, camera, K, dtype)
            meta = np.zeros((C, _meta_width(K)))
            meta[:, :K] = np.asarray(stamps_w)
            meta[:, K:4 * K] = np.asarray(gyr).reshape(C, -1)
            meta[:, 4 * K:7 * K] = np.asarray(acc).reshape(C, -1)
            meta[:, 7 * K:8 * K] = np.asarray(dts)
            meta[:, 8 * K] = np.asarray(stamps_w)[:, -1]
            meta[:, 8 * K + 1] = 1.0
            try_case("full_chunk", run_chunk, state, trk, imgs_u8,
                     jnp.asarray(meta, dtype))


if __name__ == "__main__":
    main()
