"""TPU probe 6: component-level bisect of the tracker-in-scan compiler crash.

feat_scan (racing config, x64 on) SIGABRTs the remote compiler; the filter
scans compile.  Incrementally add tracker stages inside a lax.scan until it
crashes.  Also tests x64-off and no-searched variants to isolate the trigger.

Usage: python scripts/probe_tracker_bisect.py [case ...]
cases: pyr klt ransac eq detect_nocond detect_cond fill full full_nox64
"""

import os
import sys
import time

import jax

X64 = os.environ.get("PROBE_X64", "1") == "1"
jax.config.update("jax_enable_x64", X64)
jax.config.update("jax_default_matmul_precision", "float32")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np


def main():
    cases = sys.argv[1:] or [
        "pyr", "klt", "ransac", "eq", "detect_nocond", "detect_cond", "fill", "full",
    ]
    from eqvio_tpu.frontend import tracker_init
    from eqvio_tpu.frontend.detector import detect_features, equalize_histogram
    from eqvio_tpu.frontend.klt import track_features
    from eqvio_tpu.frontend.pyramid import build_pyramid
    from eqvio_tpu.frontend.ransac import ransac_epipolar_mask
    from eqvio_tpu.frontend.tracker import tracker_step
    from eqvio_tpu.io import load_config, tracker_config_from_config

    tcfg = tracker_config_from_config(load_config("configs/config_racing_proxy.yaml"))
    N = tcfg.max_features
    trk = tracker_init(tcfg, (480, 640), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, size=(4, 480, 640)), jnp.float32)
    pos0 = jnp.asarray(rng.uniform(50, 400, size=(N, 2)), jnp.float32)
    mask0 = jnp.ones((N,), bool)

    def try_case(name, fn, *a):
        try:
            t0 = time.perf_counter()
            jax.block_until_ready(jax.jit(fn)(*a))
            print(f"{name}: ok {time.perf_counter()-t0:.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:100]}", flush=True)

    def scan_over(body, carry):
        def run(carry, imgs):
            return jax.lax.scan(body, carry, imgs)[0]

        return run

    for case in cases:
        if case == "pyr":
            def body(c, img):
                pyr = build_pyramid(img, tcfg.max_level + 1)
                return tuple(pyr), None

            try_case("pyr_in_scan", scan_over(body, tuple(trk.pyramid)),
                     tuple(trk.pyramid), imgs)
        elif case == "klt":
            def body(c, img):
                prev_pyr, pos = c
                pyr = build_pyramid(img, tcfg.max_level + 1)
                new_pos, tracked = track_features(
                    list(prev_pyr), list(pyr), pos, mask0,
                    win=tcfg.win_size, max_error=tcfg.max_error,
                )
                return (tuple(pyr), new_pos), None

            try_case("pyr+klt_in_scan",
                     scan_over(body, None), (tuple(trk.pyramid), pos0), imgs)
        elif case == "ransac":
            def body(c, img):
                prev_pyr, pos, nid = c
                pyr = build_pyramid(img, tcfg.max_level + 1)
                new_pos, tracked = track_features(
                    list(prev_pyr), list(pyr), pos, mask0,
                    win=tcfg.win_size, max_error=tcfg.max_error,
                )
                key = jax.random.fold_in(jax.random.PRNGKey(np.uint32(7)), nid)
                tracked = ransac_epipolar_mask(
                    pos, new_pos, tracked, key,
                    threshold=tcfg.ransac_inlier_threshold,
                    hypotheses=tcfg.ransac_hypotheses,
                    min_inliers=tcfg.ransac_min_inliers,
                )
                return (tuple(pyr), jnp.where(tracked[:, None], new_pos, pos),
                        nid + 1), None

            try_case("pyr+klt+ransac_in_scan", scan_over(body, None),
                     (tuple(trk.pyramid), pos0, jnp.asarray(0, jnp.int32)), imgs)
        elif case == "eq":
            def body(c, img):
                img = equalize_histogram(img)
                pyr = build_pyramid(img, tcfg.max_level + 1)
                return tuple(pyr), None

            try_case("equalize+pyr_in_scan", scan_over(body, None),
                     tuple(trk.pyramid), imgs)
        elif case == "detect_nocond":
            def body(c, img):
                pos = c
                cand, valid = detect_features(
                    img, max_features=N, min_dist=tcfg.feature_dist,
                    quality=tcfg.min_harris_quality, border=tcfg.win_size,
                    exclude=pos, exclude_mask=mask0,
                    exclude_dist=tcfg.tracked_feature_dist,
                )
                return jnp.where(valid[:, None], cand, pos), None

            try_case("detector_in_scan", scan_over(body, None), pos0, imgs)
        elif case == "detect_cond":
            def body(c, img):
                pos, flag = c

                def _d(_):
                    return detect_features(
                        img, max_features=N, min_dist=tcfg.feature_dist,
                        quality=tcfg.min_harris_quality, border=tcfg.win_size,
                        exclude=pos, exclude_mask=mask0,
                        exclude_dist=tcfg.tracked_feature_dist,
                    )

                cand, valid = jax.lax.cond(
                    flag, _d,
                    lambda _: (jnp.zeros((N, 2), jnp.float32), jnp.zeros((N,), bool)),
                    operand=None,
                )
                return (jnp.where(valid[:, None], cand, pos), ~flag), None

            try_case("detector_cond_in_scan", scan_over(body, None),
                     (pos0, jnp.asarray(True)), imgs)
        elif case == "fill":
            def body(c, img):
                trk_c = c
                trk_c = tracker_step(trk_c, img, tcfg)
                return trk_c, trk_c.searched

            try_case("full_tracker_step_in_scan", scan_over(body, None), trk, imgs)
        elif case == "full":
            def body(c, img):
                return tracker_step(c, img, tcfg), None

            try_case("tracker_step_in_scan", scan_over(body, None), trk, imgs)


if __name__ == "__main__":
    main()
