"""Analysis-module tests: alignment correctness and results.yaml schema."""

import numpy as np
import yaml

from eqvio_tpu.analysis import analyse_trajectory, summarise_results
from eqvio_tpu.io.writer import rotation_to_quaternion


def _make_trajectories(n=200, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 20, n)
    gt_pos = np.stack([np.cos(t), np.sin(t), 0.1 * t], axis=-1)
    gt_quat = np.tile([1.0, 0, 0, 0], (n, 1))
    # estimate = similarity-transformed GT + noise
    from eqvio_tpu.lie import so3_exp
    import jax.numpy as jnp

    R = np.asarray(so3_exp(jnp.asarray([0.2, -0.1, 0.5])))
    s, off = 1.3, np.array([5.0, -2.0, 1.0])
    est_pos = ((gt_pos - off) @ R) / s + rng.normal(scale=noise, size=(n, 3))
    est_quat = np.tile(rotation_to_quaternion(R.T), (n, 1))
    return t, est_pos, est_quat, gt_pos, gt_quat


def test_alignment_recovers_similarity():
    t, est_pos, est_quat, gt_pos, gt_quat = _make_trajectories(noise=0.0)
    res = analyse_trajectory(t, est_pos, est_quat, t, gt_pos, gt_quat)
    assert res["position (m)"]["rmse"] < 1e-9
    assert abs(res["scale"] - 1.3) < 1e-9
    assert res["attitude (d)"]["rmse"] < 1e-6
    assert not res["flags"]["nan"]
    assert not res["flags"]["early_finish"]


def test_noise_statistics():
    t, est_pos, est_quat, gt_pos, gt_quat = _make_trajectories(noise=0.05)
    res = analyse_trajectory(t, est_pos, est_quat, t, gt_pos, gt_quat)
    # rmse of 3-d gaussian with sigma=0.05 per axis ~ 0.0866
    assert 0.05 < res["position (m)"]["rmse"] < 0.15


def test_early_finish_flag():
    t, est_pos, est_quat, gt_pos, gt_quat = _make_trajectories()
    half = len(t) // 2
    res = analyse_trajectory(
        t[:half], est_pos[:half], est_quat[:half], t, gt_pos, gt_quat
    )
    assert res["flags"]["early_finish"]


def test_summarise(tmp_path):
    import os

    t, est_pos, est_quat, gt_pos, gt_quat = _make_trajectories()
    res = analyse_trajectory(t, est_pos, est_quat, t, gt_pos, gt_quat)
    paths = []
    for name in ["seq_a", "seq_b"]:
        d = tmp_path / name
        d.mkdir()
        p = str(d / "results.yaml")
        with open(p, "w") as f:
            yaml.safe_dump(res, f)
        paths.append(p)
    summary = summarise_results(paths)
    assert summary["completed"] == 2
    assert summary["mean position rmse"] < 1e-9


def test_timing_analysis_and_plots(tmp_path):
    """Timing CSV -> per-section stats + flamegraph/boxplot/histogram files
    (analyse_timing_data.py parity)."""
    from eqvio_tpu.analysis import analyse_timing, load_timing_csv
    from eqvio_tpu.visualisation import plot_timing

    path = tmp_path / "timing.csv"
    rng = np.random.default_rng(1)
    labels = ["features", "propagation", "correction", "write output", "total"]
    with open(path, "w") as f:
        f.write("time, " + ", ".join(labels) + "\n")
        for i in range(60):
            secs = rng.uniform(1e-3, 3e-3, size=4)
            f.write(f"{0.05*i}, " + ", ".join(f"{v:.8f}" for v in secs)
                    + f", {secs.sum():.8f}\n")

    timing = load_timing_csv(str(path), skip_first=10)
    assert len(timing["total"]) == 50
    stats = analyse_timing(str(path))
    assert 1.0 < stats["mean time (ms)"] < 12.0
    assert stats["fps"] > 80
    assert "propagation" in stats and "rmse" in stats["propagation"]

    paths = plot_timing(timing, str(tmp_path / "figs"))
    import os
    for name in ("timing_flamegraph", "timing_boxplots", "timing_histograms"):
        assert os.path.getsize(paths[name]) > 0


def test_map_display(tmp_path):
    """MapDisplay: lifetime-gated persistent points + online alignment
    (VIOVisualiser::updateMapDisplay parity)."""
    from eqvio_tpu.visualisation import MapDisplay

    disp = MapDisplay(minimum_life=2)
    rng = np.random.default_rng(3)
    pts = rng.uniform(-1, 1, size=(6, 3)) + np.array([0, 0, 4.0])
    for k in range(5):
        pose_x = np.array([0.1 * k, 0.0, 0.0])
        disp.update(
            0.1 * k, np.eye(3), pose_x, np.eye(3), np.zeros(3),
            pts - pose_x, np.arange(6), np.ones(6, bool),
            gt_position=pose_x + 1e-3,
        )
    # after 5 frames every landmark outlives minimum_life=2
    assert len(disp.persistent) == 6
    assert len(disp.trail) == 5
    out = disp.render(str(tmp_path / "map.png"))
    import os
    assert os.path.getsize(out) > 0


def test_make_report(tmp_path):
    """Figure-report parity with the reference's analyse_dataset plot set."""
    import os

    from eqvio_tpu.analysis import make_report
    from eqvio_tpu.io import VIOWriter

    out = str(tmp_path / "run")
    gt_rows = []
    with VIOWriter(out) as w:
        for k in range(30):
            t = 0.1 * k
            pos = np.array([0.2 * t, 0.1 * np.sin(t), 0.0])
            w.write_states(t, np.eye(3), pos, np.array([0.2, 0.1 * np.cos(t), 0]),
                           np.eye(3), np.zeros(3), 1e-3 * np.ones(6),
                           landmarks=np.zeros((2, 3)), landmark_ids=np.array([0, 1]),
                           landmark_mask=np.array([True, True]))
            w.write_features(t, np.zeros((2, 2)), np.array([0, 1]),
                             np.array([True, True]))
            w.write_timing(t, {"features": 1e-3, "propagation": 2e-3,
                               "correction": 1e-3, "total": 4e-3})
            gt_rows.append([t * 1e9, *pos, 1, 0, 0, 0])
    gt_csv = str(tmp_path / "gt.csv")
    np.savetxt(gt_csv, np.asarray(gt_rows), delimiter=",",
               header="t,px,py,pz,qw,qx,qy,qz", comments="")

    paths = make_report(out, gt_csv)
    for name in ("trajectory", "position_error", "velocity", "biases",
                 "camera_offset", "features", "timing_flamegraph"):
        assert name in paths and os.path.getsize(paths[name]) > 0, name


def test_velocity_error_uses_body_frame_estimate():
    """The est CSV carries BODY-frame velocity (reference convention,
    VIOState.cpp:50 / DatasetInfo.py:230); analyse_trajectory must rotate it
    to world before comparing with world-frame GT velocity."""
    from eqvio_tpu.analysis import analyse_trajectory
    from eqvio_tpu.io.writer import rotation_to_quaternion

    t = np.linspace(0.0, 10.0, 201)
    w = 0.5
    pos = np.stack([np.cos(w * t), np.sin(w * t), 0 * t], axis=1)
    vel_world = np.stack([-w * np.sin(w * t), w * np.cos(w * t), 0 * t], axis=1)
    quats, vel_body = [], []
    for k, tk in enumerate(t):
        c, s = np.cos(w * tk), np.sin(w * tk)
        R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
        quats.append(rotation_to_quaternion(R))
        vel_body.append(R.T @ vel_world[k])
    quats = np.asarray(quats)
    res = analyse_trajectory(
        t, pos, quats, t, pos, quats,
        est_vel=np.asarray(vel_body), gt_vel=vel_world,
    )
    assert res["velocity (m/s)"]["rmse"] < 1e-9
    assert res["position (m)"]["rmse"] < 1e-9
    assert res["attitude (d)"]["rmse"] < 1e-5


def test_room_trajectory_stationary_start_and_v101_stats():
    """The 'room' (V1_01 proxy) trajectory starts at rest (EuRoC stationary
    init) and matches V1_01's committed motion statistics at 144 s
    (reference configs/EQVIO_results_EuRoC_stationary.yaml length 58.56 m)."""
    import jax.numpy as jnp

    from eqvio_tpu.sim import trajectory_poses

    t, poses = trajectory_poses("room", 144.0, 50.0, dtype=jnp.float64)
    x = np.asarray(poses.x)
    tn = np.asarray(t)
    seg = np.linalg.norm(np.diff(x, axis=0), axis=1)
    speed = seg / np.diff(tn)
    assert np.all(speed[tn[:-1] < 2.5] < 1e-9), "must start at rest"
    L = float(seg.sum())
    assert abs(L - 58.56) < 1.0, L
    assert speed.max() < 2.0


def test_live_display_server():
    """LiveDisplayServer: serves status and a rendered PNG of the live map
    over localhost HTTP (the reference GLUT plotter's headless equivalent,
    run_opt --live)."""
    import json as _json
    import urllib.request

    import numpy as np

    from eqvio_tpu.visualisation import LiveDisplayServer

    srv = LiveDisplayServer(port=0)  # ephemeral port
    try:
        R = np.eye(3)
        pts = np.array([[0.0, 0.0, 2.0], [0.5, 0.2, 3.0]])
        ids = np.array([1, 2])
        mask = np.array([True, True])
        for k in range(5):
            srv.update(0.05 * k, R, np.array([0.01 * k, 0, 0]), R,
                       np.zeros(3), pts, ids, mask)
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/status.json", timeout=10
        ) as r:
            st = _json.loads(r.read())
        assert st["frames"] == 5
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/map.png", timeout=30
        ) as r:
            png = r.read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n" and len(png) > 1000
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/", timeout=10
        ) as r:
            assert b"eqvio_tpu live" in r.read()
    finally:
        srv.close()
