"""Real-data VIO entry point: the ``eqvio_opt`` equivalent.

CLI and pipeline mirror the reference main loop (``src/main_opt.cpp:45-277``):
dataset reader -> feature tracking -> EqF filter -> CSV outputs, with
``--start/--stop`` windowing, ``--timing`` rows, and the dataset camera yaml
overriding config extrinsics (``main_opt.cpp:143-147``).

TPU-native split: image decode + stream merge stay on the host prefetch
thread; the tracker step and the filter step are two jitted device programs
per frame (tracking batched over features, the filter's whole frame fused).

Usage:
    python -m eqvio_tpu.app.run_opt <dataset_dir> <config.yaml>
        [--mode asl|uzhfpv] [--output DIR] [--start T] [--stop T] [--timing]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from .. import filter as F
from ..camera import EquidistantCamera, PinholeCamera, RadTanCamera
from ..data import DataServer, create_dataset_reader
from ..frontend import tracker_init, tracker_step
from ..io import LoopTimer, VIOWriter, load_config, settings_from_config, tracker_config_from_config
from ..io.writer import rotation_to_quaternion
from ..states import IMU

TIMING_LABELS = ["features", "propagation", "preprocessing", "correction", "total vision update", "write output", "total"]


def _build_imu_window(imu_buf, t_prev, stamp, imu_window):
    """Assemble the zero-dt-padded IMU window covering [t_prev, stamp].

    Mirrors the reference's buffered-IMU integration semantics
    (``VIOFilter::integrateUpToTime``, VIOFilter.cpp:134-192): each buffered
    entry contributes its overlap with the window; zero-dt pad entries are
    exact no-ops in every propagation path (design invariant).

    Returns ``((stamps, gyr, acc, dts) numpy arrays, trimmed imu_buf)``.
    """
    kept = []
    for j, (ts, gyr, acc) in enumerate(imu_buf):
        t1 = imu_buf[j + 1][0] if j + 1 < len(imu_buf) else stamp
        dt = max(min(t1, stamp) - max(ts, t_prev), 0.0)
        if dt > 0 or not kept:
            kept.append((ts, gyr, acc, dt))
    kept = kept[-imu_window:]
    K = imu_window
    arr_stamp = np.full(K, kept[-1][0] if kept else stamp)
    arr_gyr = np.zeros((K, 3))
    arr_acc = np.zeros((K, 3))
    arr_dt = np.zeros(K)
    for j, (ts, gyr, acc, dt) in enumerate(kept):
        arr_stamp[j] = ts
        arr_gyr[j] = gyr
        arr_acc[j] = acc
        arr_dt[j] = dt
    for j in range(len(kept), K):
        if kept:
            arr_gyr[j] = kept[-1][1]
            arr_acc[j] = kept[-1][2]
    arr_stamp[len(kept):] = stamp
    trimmed = [e for e in imu_buf if e[0] >= stamp - 0.05]
    return (arr_stamp, arr_gyr, arr_acc, arr_dt), trimmed


def camera_from_info(info, dtype=jnp.float64):
    fx, fy, cx, cy = info.intrinsics
    w, h = info.resolution
    if info.model == "radtan":
        if np.allclose(info.distortion, 0.0):
            return PinholeCamera.create(fx, fy, cx, cy, w, h, dtype=dtype)
        return RadTanCamera.create(fx, fy, cx, cy, info.distortion, w, h, dtype=dtype)
    if info.model == "equidistant":
        return EquidistantCamera.create(fx, fy, cx, cy, info.distortion, w, h, dtype=dtype)
    return PinholeCamera.create(fx, fy, cx, cy, w, h, dtype=dtype)


def _make_chunk_runner(tcfg, settings, suite, camera, imu_window, dtype):
    """One jitted program: scan (tracker -> propagate -> vision update) over a
    fixed-size chunk of frames.  The TPU-native answer to the reference's
    per-frame loop (``main_opt.cpp:178-245``): decode->track->filter are fused
    into a single device program, host transfers amortised chunk-size times.

    Padded tail frames carry ``valid=False`` and pass the carry through
    unchanged, so every chunk has one static shape -> exactly one compile.
    """
    from ..frontend.tracker import tracker_step as _tracker_step

    K = imu_window

    def frame_fn(carry, inp):
        state, tracker = carry
        img, stamps_w, gyr_w, acc_w, dts, stamp, valid = inp
        imu_win = IMU(
            stamp=stamps_w,
            gyr=gyr_w,
            acc=acc_w,
            gyr_bias_vel=jnp.zeros((K, 3), dtype=dtype),
            acc_bias_vel=jnp.zeros((K, 3), dtype=dtype),
        )
        if settings.use_feature_predictions:
            # feature predictions stay ON DEVICE: forward-predict the state
            # over the frame's IMU window and project (reference
            # getFeaturePredictions, VIOFilter.cpp:247-252)
            xi_pred = F.predict_state(state, stamp, imu_win, dts)
            pred_px = camera.project(xi_pred.landmarks).astype(jnp.float32)
            predicted = jnp.where(
                xi_pred.mask[:, None], pred_px, tracker.positions
            )
            new_tracker = _tracker_step(tracker, img, tcfg, predicted=predicted)
        else:
            new_tracker = _tracker_step(tracker, img, tcfg)
        pixels = new_tracker.positions.astype(dtype)
        vis = new_tracker.mask
        ids = new_tracker.ids
        new_state = F.propagate_window(state, imu_win, dts, settings, suite)
        new_state = F.process_vision(
            new_state, pixels, vis, ids, camera, settings, suite
        )
        new_state = new_state._replace(t=stamp)
        state = jax.tree.map(lambda a, b: jnp.where(valid, a, b), new_state, state)
        tracker = jax.tree.map(
            lambda a, b: jnp.where(valid, a, b), new_tracker, tracker
        )
        est = F.state_estimate(state)
        out = (
            est.sensor.pose.R,
            est.sensor.pose.x,
            est.sensor.velocity,
            est.sensor.camera_offset.R,
            est.sensor.camera_offset.x,
            est.sensor.bias,
            est.landmarks,
            est.ids,
            est.mask,
            pixels,
            ids,
            vis,
        )
        return (state, tracker), out

    def run_chunk(state, tracker, imgs_u8, stamps_w, gyr_w, acc_w, dts, stamps, valid):
        # frames ship as uint8 (4x less host->device traffic than f32 — the
        # dominant cost behind a tunneled/remote device) and are normalised
        # on device
        imgs = imgs_u8.astype(jnp.float32) * (1.0 / 255.0)
        return jax.lax.scan(
            frame_fn,
            (state, tracker),
            (imgs, stamps_w, gyr_w, acc_w, dts, stamps, valid),
        )

    # donate the carry: the previous chunk's state/tracker buffers are dead
    # the moment the next chunk is dispatched
    return jax.jit(run_chunk, donate_argnums=(0, 1))


def run_dataset(
    dataset_dir: str,
    config: dict,
    mode: str = "asl",
    output_dir: str | None = None,
    start: float | None = None,
    stop: float | None = None,
    camera_yaml: str | None = None,
    timing: bool = False,
    imu_window: int = 32,
    dtype=jnp.float64,
    limit_frames: int | None = None,
    simvis: bool = False,
    simimu: bool = False,
    limit_rate: float | None = None,
    profile_dir: str | None = None,
    camera_lag: float | None = None,
    chunk_size: int = 16,
):
    """Run the full real-data pipeline; returns (writer, summary dict).

    ``start``/``stop`` are offsets from the first data time, matching the
    reference (``main_opt.cpp:124-130``), so batch YAMLs carry portable
    per-sequence windows instead of absolute epoch stamps.
    """
    if camera_lag is None:
        camera_lag = float((config.get("main", {}) or {}).get("cameraLag", 0.0))
    reader = create_dataset_reader(mode, dataset_dir, camera_yaml, camera_lag)

    first_stamps = [s[0] for s in (reader.imu.stamps, reader.images.stamps) if len(s)]
    t0_data = float(min(first_stamps)) if first_stamps else 0.0
    start = t0_data + start if start and start > 0 else None
    stop = t0_data + stop if stop and stop > 0 else None
    settings = settings_from_config(config)
    tcfg = tracker_config_from_config(config)

    # dataset camera extrinsics override the config (main_opt.cpp:143-147)
    T_BS = reader.camera.T_BS
    quat = rotation_to_quaternion(T_BS[:3, :3])
    settings = F.Settings(
        **{
            **settings.__dict__,
            "camera_offset_quat": tuple(quat.tolist()),
            "camera_offset_pos": tuple(T_BS[:3, 3].tolist()),
        }
    )
    if jnp.dtype(dtype) == jnp.float32 and not settings.sqrt_covariance:
        # f32 cannot Cholesky the tuned configs' covariance spread (~1e13);
        # the sqrt filter carries the factor instead (condition = sqrt of the
        # covariance's).  Auto-enable unless the config asked explicitly.
        from ..io.config import safe_get

        explicit = safe_get(config.get("eqf", {}) or {},
                            "settings:useSqrtCovariance", None, warn=False)
        if explicit is None:
            settings = F.Settings(**{**settings.__dict__, "sqrt_covariance": True})

    camera = camera_from_info(reader.camera, dtype)
    capacity = tcfg.max_features
    w, h = reader.camera.resolution

    state = F.init_state(settings, capacity, dtype)
    tracker = tracker_init(tcfg, (h, w), dtype=jnp.float32)
    suite = settings.suite

    sim = None
    sim_tracker = None
    if simvis or simimu:
        # replace real vision and/or IMU with simulated measurements generated
        # around the dataset ground truth (reference --simvis/--simimu,
        # main_opt.cpp:194-198,249-253 via DataServerBase::getSimVision/getSimIMU)
        from ..analysis import quat_to_rot
        from ..lie import SE3 as _SE3
        from ..sim import Simulator, slot_tracker_init

        gt = reader.groundtruth
        if gt is None:
            raise ValueError("--simvis/--simimu need dataset ground truth")
        poses = _SE3(
            jnp.asarray(quat_to_rot(gt.quaternion), dtype=dtype),
            jnp.asarray(gt.position, dtype=dtype),
        )
        sim = Simulator.from_poses(
            gt.stamps, poses, settings.camera_offset_se3(dtype), dtype=dtype
        )
        if simvis:
            sim_tracker = slot_tracker_init(capacity)

    jit_tracker = jax.jit(lambda ts, img: tracker_step(ts, img, tcfg))
    # one persistent jit for the predicted-feature tracker path: constructing
    # the closure per frame would retrace and recompile every frame
    jit_tracker_pred = jax.jit(
        lambda ts, img, pr: tracker_step(ts, img, tcfg, predicted=pr)
    )

    @jax.jit
    def jit_filter(state, imu_win, dts, pixels, vis, ids):
        state = F.propagate_window(state, imu_win, dts, settings, suite)
        state = F.process_vision(state, pixels, vis, ids, camera, settings, suite)
        return state

    server = DataServer(reader, start_time=start, stop_time=stop)

    writer = VIOWriter(output_dir) if output_dir else None
    loop_timer = LoopTimer(TIMING_LABELS)

    if chunk_size > 1 and not simvis:
        return _run_fused(
            server, state, tracker, tcfg, settings, suite, camera, writer,
            timing, imu_window, dtype, chunk_size, limit_frames, limit_rate,
            profile_dir, simimu, sim,
        )

    imu_buf: list[tuple[float, np.ndarray, np.ndarray]] = []
    initialised = False
    n_frames = 0
    t_prev_host = -1.0  # host-tracked filter time: avoids a device sync per frame
    t_begin = time.perf_counter()

    if profile_dir:
        # device-level kernel attribution (roadmap: host wall-time sections
        # can't see inside the fused jit programs): XLA trace viewable in
        # TensorBoard / xprof
        jax.profiler.start_trace(profile_dir)

    rate_mark = time.perf_counter()
    for meas in server:
        if meas.kind == "imu":
            gyr, acc = meas.data
            if simimu:
                sim_imu = sim.get_imu(jnp.asarray(meas.stamp, dtype=dtype))
                gyr = np.asarray(sim_imu.gyr)
                acc = np.asarray(sim_imu.acc)
            if not initialised:
                state = F.initialize_attitude_from_imu(
                    state,
                    IMU.create(
                        jnp.asarray(meas.stamp, dtype=dtype),
                        jnp.asarray(gyr, dtype=dtype),
                        jnp.asarray(acc, dtype=dtype),
                    ),
                )
                initialised = True
            imu_buf.append((meas.stamp, gyr, acc))
            continue

        # ---- image measurement ----
        if not initialised:
            continue
        loop_timer.start_loop()
        loop_timer.start_timing("total")

        loop_timer.start_timing("features")
        img = np.asarray(meas.data)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) * (1.0 / 255.0)
        img = jnp.asarray(img, dtype=jnp.float32)
        if simvis:
            from ..sim import gather_slots_compact, slot_tracker_step_compact

            sel_ids, sel_pts = sim.get_vision_compact(
                jnp.asarray(meas.stamp, dtype=dtype), camera, tcfg.max_features
            )
            sim_tracker = slot_tracker_step_compact(sim_tracker, sel_ids)
            pixels, vis, ids, _ = gather_slots_compact(sel_ids, sel_pts, sim_tracker, camera)
        elif settings.use_feature_predictions:
            # predict feature pixels from the current state, all on device
            # (reference getFeaturePredictions, VIOFilter.cpp:247-252)
            est = F.state_estimate(state)
            predicted = jnp.where(
                est.mask[:, None],
                camera.project(est.landmarks).astype(jnp.float32),
                tracker.positions,
            )
            tracker = jit_tracker_pred(tracker, img, predicted)
        else:
            tracker = jit_tracker(tracker, img)
        if not simvis:
            pixels = jnp.asarray(tracker.positions, dtype=dtype)
            vis = tracker.mask
            ids = tracker.ids
        loop_timer.end_timing("features")

        # build the padded IMU window for [prev_t, stamp]
        loop_timer.start_timing("propagation")
        t_prev = t_prev_host if t_prev_host >= 0 else float(state.t)
        (arr_stamp, arr_gyr, arr_acc, arr_dt), imu_buf = _build_imu_window(
            imu_buf, t_prev, meas.stamp, imu_window
        )
        K = imu_window
        imu_win = IMU(
            stamp=jnp.asarray(arr_stamp, dtype=dtype),
            gyr=jnp.asarray(arr_gyr, dtype=dtype),
            acc=jnp.asarray(arr_acc, dtype=dtype),
            gyr_bias_vel=jnp.zeros((K, 3), dtype=dtype),
            acc_bias_vel=jnp.zeros((K, 3), dtype=dtype),
        )
        loop_timer.end_timing("propagation")

        loop_timer.start_timing("total vision update")
        state = jit_filter(
            state, imu_win, jnp.asarray(arr_dt, dtype=dtype), pixels, vis, ids
        )
        state = state._replace(t=jnp.asarray(meas.stamp, dtype=dtype))
        t_prev_host = meas.stamp
        loop_timer.end_timing("total vision update")

        loop_timer.start_timing("write output")
        if writer is not None:
            est = F.state_estimate(state)
            writer.write_states(
                meas.stamp,
                np.asarray(est.sensor.pose.R),
                np.asarray(est.sensor.pose.x),
                np.asarray(est.sensor.velocity),
                np.asarray(est.sensor.camera_offset.R),
                np.asarray(est.sensor.camera_offset.x),
                np.asarray(est.sensor.bias),
                landmarks=np.asarray(est.landmarks),
                landmark_ids=np.asarray(est.ids),
                landmark_mask=np.asarray(est.mask),
            )
            writer.write_features(meas.stamp, np.asarray(pixels), np.asarray(ids), np.asarray(vis))
        loop_timer.end_timing("write output")
        loop_timer.end_timing("total")

        if writer is not None and timing:
            t0_row, row = loop_timer.frame_row()
            writer.write_timing(t0_row, row)

        n_frames += 1
        if limit_frames and n_frames >= limit_frames:
            break
        if limit_rate and limit_rate > 0:
            # pace the loop to at most limit_rate frames/s (main_opt.cpp:241-244)
            sleep_for = rate_mark + 1.0 / limit_rate - time.perf_counter()
            if sleep_for > 0:
                time.sleep(sleep_for)
            rate_mark = time.perf_counter()

    elapsed = time.perf_counter() - t_begin
    if profile_dir:
        jax.profiler.stop_trace()
    if writer is not None:
        writer.flush()
    est = F.state_estimate(state)
    health = {k: bool(v) for k, v in F.health_check(state, settings).items()}
    summary = {
        "frames": n_frames,
        "fps": n_frames / max(elapsed, 1e-9),
        "final_position": np.asarray(est.sensor.pose.x).tolist(),
        "landmarks": int(np.asarray(est.mask).sum()),
        "nan": health["nan"],
        "healthy": health["nan"] is False and health["scales_valid"],
    }
    return state, summary


def _run_fused(
    server, state, tracker, tcfg, settings, suite, camera, writer,
    timing, imu_window, dtype, chunk_size, limit_frames, limit_rate,
    profile_dir, simimu, sim,
):
    """Chunked device loop: K frames per dispatch, outputs pulled once per
    chunk (replaces the reference's per-frame loop with a fused scan)."""
    run_chunk = _make_chunk_runner(tcfg, settings, suite, camera, imu_window, dtype)
    C = chunk_size

    imu_buf: list[tuple[float, np.ndarray, np.ndarray]] = []
    initialised = False
    t_prev_host = -1.0
    n_frames = 0
    pend: list[tuple] = []  # (stamp, img, w_stamp, w_gyr, w_acc, w_dt, asm_time)
    t_begin = time.perf_counter()
    rate_mark = time.perf_counter()

    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    # one-chunk software pipeline: results of chunk k are fetched and written
    # while the device computes chunk k+1 (dispatch is async; only
    # jax.device_get blocks).  deferred = (stamps, n, outs, t_dispatch)
    deferred: list[tuple] = []

    def process_deferred():
        nonlocal n_frames, rate_mark
        if not deferred:
            return
        stamps, n, outs, t_disp = deferred.pop()
        t_get0 = time.perf_counter()
        if writer is not None:
            outs = jax.device_get(outs)
        t_get = time.perf_counter() - t_get0
        t_wr0 = time.perf_counter()
        if writer is not None:
            (pR, px, vel, cR, cx, bias, lms, lids, lmask, fpx, fids, fvis) = outs
            for i in range(n):
                writer.write_states(
                    stamps[i], pR[i], px[i], vel[i], cR[i], cx[i], bias[i],
                    landmarks=lms[i], landmark_ids=lids[i], landmark_mask=lmask[i],
                )
                writer.write_features(stamps[i], fpx[i], fids[i], fvis[i])
        t_wr = time.perf_counter() - t_wr0
        if writer is not None and timing:
            # chunk sections averaged per frame ("features" is inside the
            # fused device program -> reported under "total vision update")
            for _ in range(n):
                row = {lab: 0.0 for lab in TIMING_LABELS}
                row["total vision update"] = (t_disp + t_get) / n
                row["write output"] = t_wr / n
                row["total"] = (t_disp + t_get + t_wr) / n
                writer.write_timing(t_get0, row)
        n_frames += n
        if limit_rate and limit_rate > 0:
            sleep_for = rate_mark + n / limit_rate - time.perf_counter()
            if sleep_for > 0:
                time.sleep(sleep_for)
            rate_mark = time.perf_counter()

    def flush():
        nonlocal state, tracker
        if not pend:
            return
        n = len(pend)
        img0 = pend[0][1]
        imgs = np.zeros((C,) + img0.shape, dtype=np.uint8)
        stamps_w = np.zeros((C, imu_window))
        gyr_w = np.zeros((C, imu_window, 3))
        acc_w = np.zeros((C, imu_window, 3))
        dts = np.zeros((C, imu_window))
        stamps = np.zeros(C)
        valid = np.zeros(C, dtype=bool)
        for i, (st, im, ws, wg, wa, wd, _asm) in enumerate(pend):
            imgs[i] = im
            stamps_w[i] = ws
            gyr_w[i] = wg
            acc_w[i] = wa
            dts[i] = wd
            stamps[i] = st
            valid[i] = True
        t_disp0 = time.perf_counter()
        (state, tracker), outs = run_chunk(
            state,
            tracker,
            jnp.asarray(imgs),
            jnp.asarray(stamps_w, dtype=dtype),
            jnp.asarray(gyr_w, dtype=dtype),
            jnp.asarray(acc_w, dtype=dtype),
            jnp.asarray(dts, dtype=dtype),
            jnp.asarray(stamps, dtype=dtype),
            jnp.asarray(valid),
        )
        if writer is not None:
            # start device->host copies now; they overlap the next chunk
            for leaf in jax.tree.leaves(outs):
                try:
                    leaf.copy_to_host_async()
                except AttributeError:
                    pass
        t_disp = time.perf_counter() - t_disp0
        pend.clear()
        # fetch + write the PREVIOUS chunk while this one computes
        process_deferred()
        deferred.append((stamps.copy(), n, outs, t_disp))

    for meas in server:
        if meas.kind == "imu":
            gyr, acc = meas.data
            if simimu:
                sim_imu = sim.get_imu(jnp.asarray(meas.stamp, dtype=dtype))
                gyr = np.asarray(sim_imu.gyr)
                acc = np.asarray(sim_imu.acc)
            if not initialised:
                state = F.initialize_attitude_from_imu(
                    state,
                    IMU.create(
                        jnp.asarray(meas.stamp, dtype=dtype),
                        jnp.asarray(gyr, dtype=dtype),
                        jnp.asarray(acc, dtype=dtype),
                    ),
                )
                initialised = True
                t_prev_host = meas.stamp
            imu_buf.append((meas.stamp, gyr, acc))
            continue
        if not initialised:
            continue
        t_asm0 = time.perf_counter()
        (ws, wg, wa, wd), imu_buf = _build_imu_window(
            imu_buf, t_prev_host, meas.stamp, imu_window
        )
        t_prev_host = meas.stamp
        im = np.asarray(meas.data)
        if im.dtype != np.uint8:
            # round, don't truncate: decoded f32 pixels are k/255 +- eps
            im = (im * 255.0 + 0.5).astype(np.uint8)
        pend.append(
            (
                meas.stamp,
                im,
                ws, wg, wa, wd,
                time.perf_counter() - t_asm0,
            )
        )
        if len(pend) == C:
            flush()
        if limit_frames and n_frames + len(pend) + (deferred[0][1] if deferred else 0) >= limit_frames:
            break
    flush()
    process_deferred()

    elapsed = time.perf_counter() - t_begin
    if profile_dir:
        jax.profiler.stop_trace()
    if writer is not None:
        writer.flush()
    est = F.state_estimate(state)
    health = {k: bool(v) for k, v in F.health_check(state, settings).items()}
    summary = {
        "frames": n_frames,
        "fps": n_frames / max(elapsed, 1e-9),
        "final_position": np.asarray(est.sensor.pose.x).tolist(),
        "landmarks": int(np.asarray(est.mask).sum()),
        "nan": health["nan"],
        "healthy": health["nan"] is False and health["scales_valid"],
    }
    return state, summary


def main(argv=None):
    ap = argparse.ArgumentParser(description="TPU-native EqVIO on a real dataset")
    ap.add_argument("dataset")
    ap.add_argument("config")
    ap.add_argument("--mode", default="asl")
    ap.add_argument("--output", default=None)
    ap.add_argument("--camera", default=None)
    ap.add_argument("--start", type=float, default=None)
    ap.add_argument("--stop", type=float, default=None)
    ap.add_argument("--timing", action="store_true")
    ap.add_argument("--simvis", action="store_true",
                    help="replace vision with simulated measurements around ground truth")
    ap.add_argument("--simimu", action="store_true",
                    help="replace IMU with simulated measurements around ground truth")
    ap.add_argument("--limitRate", type=float, default=0.0, dest="limit_rate",
                    help="maximum image processing rate in Hz (0 = unlimited)")
    ap.add_argument("--profile", default=None,
                    help="write an XLA profiler trace to this directory")
    ap.add_argument("--chunk", type=int, default=16,
                    help="frames per fused device dispatch (1 = per-frame loop)")
    ap.add_argument("--f64", action="store_true",
                    help="f64 filter math even on TPU (accuracy validation; "
                         "the image front end stays f32)")
    ap.add_argument("--display", action="store_true", help="accepted for parity; no GUI")
    args = ap.parse_args(argv)

    from ._env import configure_runtime

    dtype = configure_runtime(force_x64=args.f64)

    config = load_config(args.config)
    # config main: section supplies defaults the CLI can override
    main_cfg = config.get("main", {}) or {}
    if args.start is None and float(main_cfg.get("startTime", 0.0)) > 0:
        args.start = float(main_cfg["startTime"])
    if not args.limit_rate and float(main_cfg.get("limitRate", 0.0)) > 0:
        args.limit_rate = float(main_cfg["limitRate"])
    _, summary = run_dataset(
        args.dataset,
        config,
        mode=args.mode,
        output_dir=args.output,
        start=args.start,
        stop=args.stop,
        camera_yaml=args.camera,
        timing=args.timing,
        simvis=args.simvis,
        simimu=args.simimu,
        limit_rate=args.limit_rate,
        profile_dir=args.profile,
        dtype=dtype,
        chunk_size=args.chunk,
    )
    status = "OK" if summary.get("healthy") else "UNHEALTHY (NaN/scale)"
    print(f"Processed {summary['frames']} frames at {summary['fps']:.1f} fps; "
          f"{summary['landmarks']} landmarks live; filter {status}.")


if __name__ == "__main__":
    main()
