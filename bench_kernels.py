"""Per-kernel timings: EqF update, propagation window, KLT tracker, full frame.

The reference analogue is the timing.csv flamegraph labels
(features/preprocessing/propagation/correction, analyse_timing_data.py:10-17).
Run on the target backend; prints one JSON object per kernel.
"""

import json
import time

import numpy as np


def _time(f, *args, reps=50):
    import jax

    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "float32")

    from eqvio_tpu import filter as F
    from eqvio_tpu.frontend import TrackerConfig, tracker_init, tracker_step
    from eqvio_tpu.runner import default_sim_camera
    from eqvio_tpu.states import IMU

    dtype = jnp.float32
    settings = F.Settings(
        measurement_noise=0.5, coordinate_choice="invdepth", fast_riccati=True,
        use_discrete_innovation_lift=False, use_median_depth=False,
    )
    suite = settings.suite
    cam = default_sim_camera(dtype)
    N, K = 32, 12
    rng = np.random.default_rng(0)

    state = F.init_state(settings, N, dtype)
    pixels = jnp.asarray(rng.uniform(100, 500, size=(N, 2)), dtype=dtype)
    vis = jnp.ones(N, dtype=bool)
    ids = jnp.arange(N, dtype=jnp.int32)
    state = F.add_landmarks(state, pixels, vis, ids, cam, settings)
    imu_win = IMU(
        stamp=jnp.asarray(np.linspace(0, 0.055, K), dtype=dtype),
        gyr=jnp.asarray(rng.normal(size=(K, 3)) * 0.1, dtype=dtype),
        acc=jnp.asarray(rng.normal(size=(K, 3)) * 0.1 + [0, 0, 9.8], dtype=dtype),
        gyr_bias_vel=jnp.zeros((K, 3), dtype=dtype),
        acc_bias_vel=jnp.zeros((K, 3), dtype=dtype),
    )
    dts = jnp.full((K,), 0.005, dtype=dtype)

    upd = jax.jit(lambda s, p, v: F.update_vision(s, p, v, cam, settings, suite))
    prop = jax.jit(lambda s, w, d: F.propagate_window(s, w, d, settings, suite))
    full = jax.jit(
        lambda s, w, d, p, v, i: F.process_vision(
            F.propagate_window(s, w, d, settings, suite), p, v, i, cam, settings, suite
        )
    )

    results = {
        "eqf_update_ms_per_frame": round(_time(upd, state, pixels, vis), 4),
        "propagation_window_ms_per_frame": round(_time(prop, state, imu_win, dts), 4),
        "full_filter_frame_ms": round(_time(full, state, imu_win, dts, pixels, vis, ids), 4),
    }

    # square-root covariance mode (the production f32 numerics: QR-based
    # propagate + Kailath array update — what every TPU run actually executes)
    settings_sq = F.Settings(**{**settings.__dict__, "sqrt_covariance": True})
    state_sq = F.init_state(settings_sq, N, dtype)
    state_sq = F.add_landmarks(state_sq, pixels, vis, ids, cam, settings_sq)
    upd_sq = jax.jit(lambda s, p, v: F.update_vision(s, p, v, cam, settings_sq, suite))
    prop_sq = jax.jit(lambda s, w, d: F.propagate_window(s, w, d, settings_sq, suite))
    full_sq = jax.jit(
        lambda s, w, d, p, v, i: F.process_vision(
            F.propagate_window(s, w, d, settings_sq, suite), p, v, i, cam, settings_sq, suite
        )
    )
    results["sqrt_eqf_update_ms_per_frame"] = round(_time(upd_sq, state_sq, pixels, vis), 4)
    results["sqrt_propagation_window_ms_per_frame"] = round(
        _time(prop_sq, state_sq, imu_win, dts), 4
    )
    results["sqrt_full_filter_frame_ms"] = round(
        _time(full_sq, state_sq, imu_win, dts, pixels, vis, ids), 4
    )

    # tracker on a VGA-class frame
    tcfg = TrackerConfig(max_features=30, win_size=21, max_level=3, max_error=1e8)
    trk = tracker_init(tcfg, (480, 752))
    img = jnp.asarray(rng.uniform(0, 1, size=(480, 752)), dtype=jnp.float32)
    step = jax.jit(lambda t, im: tracker_step(t, im, tcfg))
    trk = step(trk, img)  # populate
    results["tracker_ms_per_frame"] = round(_time(step, trk, img, reps=20), 4)

    # sub-components
    from eqvio_tpu.frontend import build_pyramid, detect_features
    from eqvio_tpu.frontend.klt import track_features

    det = jax.jit(
        lambda im, ex, em: detect_features(
            im, 30, min_dist=tcfg.feature_dist, exclude=ex, exclude_mask=em
        )
    )
    ex = trk.positions
    em = trk.mask
    results["detector_ms"] = round(_time(det, img, ex, em, reps=20), 4)

    pyr = build_pyramid(img, 4)
    pyr_fn = jax.jit(lambda im: build_pyramid(im, 4))
    results["pyramid_ms"] = round(_time(pyr_fn, img, reps=20), 4)

    klt = jax.jit(
        lambda p: track_features(pyr, pyr, p, jnp.ones(30, bool), win=21, mode="mxu")
    )
    results["klt_mxu_ms"] = round(_time(klt, trk.positions, reps=20), 4)

    if jax.default_backend() != "cpu":
        # Pallas compiled-mode may be unavailable (remote-compile tunnels lack
        # the TPU env; see CLAUDE.md) — never let it kill the JSON line.
        try:
            klt_p = jax.jit(
                lambda p: track_features(
                    pyr, pyr, p, jnp.ones(30, bool), win=21, mode="pallas"
                )
            )
            results["klt_pallas_ms"] = round(_time(klt_p, trk.positions, reps=20), 4)
        except Exception as e:  # noqa: BLE001
            results["klt_pallas_error"] = type(e).__name__

    # single-chip batch scaling: the MEASURABLE scaling curve on one real
    # device (VERDICT r2 #7 — the virtual multi-device table is
    # correctness-only).  Aggregate filter fps over B concurrent sequences.
    try:
        from eqvio_tpu.runner import build_sim_runner, prepare_sim_inputs

        inputs = prepare_sim_inputs(
            settings, capacity=N, max_features=30, end_time=10.0,
            imu_freq=200.0, frame_freq=20.0, num_walls=4, dtype=dtype,
        )
        curve = {}
        for B in (1, 8, 32, 128):
            run_b = build_sim_runner(
                settings, inputs, augment_true_landmarks=False,
                compute_nees=False, batch=(B if B > 1 else None),
            )
            res_b = run_b()
            jax.block_until_ready(res_b.est_position)
            n_frames = int(res_b.times.shape[0])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                res_b = run_b()
                jax.block_until_ready(res_b.est_position)
                best = min(best, time.perf_counter() - t0)
            curve[str(B)] = round(B * n_frames / best, 1)
        results["batch_scaling_fps"] = curve
    except Exception as e:  # noqa: BLE001
        results["batch_scaling_error"] = type(e).__name__

    print(json.dumps(results))


if __name__ == "__main__":
    main()
