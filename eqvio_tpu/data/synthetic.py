"""Synthetic ASL-format dataset generation for hermetic end-to-end tests.

Renders the simulator's world points into PNG frames and writes a full
EuRoC/ASL directory tree (imu0/cam0 data.csv, sensor.yaml, ground truth), so
the real-data path — reader, tracker, filter, writer — can be exercised
without any external dataset.  (The reference has no equivalent; its dataset
tests are external scripts.)
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..io.writer import rotation_to_quaternion
from ..lie import se3_inv, se3_mul, SE3
from ..sim import Simulator


def _render(points_px: np.ndarray, visible: np.ndarray, w: int, h: int, rng) -> np.ndarray:
    """Render visible points as bright 2-D gaussian blobs + mild noise."""
    img = np.zeros((h, w), dtype=np.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    for (x, y), v in zip(points_px, visible):
        if v and 2 < x < w - 2 and 2 < y < h - 2:
            x0, x1 = max(0, int(x) - 4), min(w, int(x) + 5)
            y0, y1 = max(0, int(y) - 4), min(h, int(y) + 5)
            img[y0:y1, x0:x1] += np.exp(
                -((xs[y0:y1, x0:x1] - x) ** 2 + (ys[y0:y1, x0:x1] - y) ** 2) / 3.0
            )
    img += rng.normal(scale=0.01, size=img.shape).astype(np.float32)
    return np.clip(img, 0.0, 1.0)


def generate_asl_dataset(
    out_dir: str,
    end_time: float = 5.0,
    imu_freq: float = 200.0,
    frame_freq: float = 20.0,
    width: int = 320,
    height: int = 240,
    num_points: int = 400,
    seed: int = 0,
):
    """Write a synthetic ASL dataset tree under ``out_dir``; returns the Simulator."""
    from PIL import Image

    sim = Simulator.create(
        kind="wave", end_time=end_time + 1.0, num_points=num_points, num_walls=4,
        seed=seed,
    )
    fx = fy = 200.0
    cx, cy = width / 2, height / 2

    base = os.path.join(out_dir, "mav0")
    for sub in ["imu0", "cam0/data", "state_groundtruth_estimate0"]:
        os.makedirs(os.path.join(base, sub), exist_ok=True)

    rng = np.random.default_rng(seed)
    t0 = 0.2

    # IMU
    imu_times = np.arange(t0, end_time, 1.0 / imu_freq)
    imu = sim.get_imu_batch(jnp.asarray(imu_times))
    with open(os.path.join(base, "imu0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z\n")
        for t, g, a in zip(imu_times, np.asarray(imu.gyr), np.asarray(imu.acc)):
            f.write(f"{int(t * 1e9)}," + ",".join(f"{v:.9f}" for v in [*g, *a]) + "\n")

    # camera yaml (EuRoC sensor.yaml schema)
    T_BS = np.eye(4)
    T_BS[:3, :3] = np.asarray(sim.camera_offset.R)
    T_BS[:3, 3] = np.asarray(sim.camera_offset.x)
    with open(os.path.join(base, "cam0", "sensor.yaml"), "w") as f:
        f.write(
            "sensor_type: camera\n"
            f"T_BS:\n  rows: 4\n  cols: 4\n  data: {T_BS.reshape(-1).tolist()}\n"
            f"rate_hz: {frame_freq}\n"
            f"resolution: [{width}, {height}]\n"
            "camera_model: pinhole\n"
            f"intrinsics: [{fx}, {fy}, {cx}, {cy}]\n"
            "distortion_model: radial-tangential\n"
            "distortion_coefficients: [0.0, 0.0, 0.0, 0.0]\n"
        )

    # frames
    frame_times = np.arange(t0 + 1.0 / frame_freq, end_time, 1.0 / frame_freq)
    with open(os.path.join(base, "cam0", "data.csv"), "w") as f:
        f.write("#timestamp [ns],filename\n")
        for t in frame_times:
            pose = sim.interpolate_pose(jnp.asarray(t))
            cam_inv = se3_inv(se3_mul(pose, sim.camera_offset))
            pts = np.asarray(
                jnp.einsum("ij,pj->pi", cam_inv.R, sim.world) + cam_inv.x
            )
            z = pts[:, 2]
            px = np.stack(
                [fx * pts[:, 0] / np.where(np.abs(z) < 1e-6, 1e-6, z) + cx,
                 fy * pts[:, 1] / np.where(np.abs(z) < 1e-6, 1e-6, z) + cy],
                axis=-1,
            )
            vis = (z > 0.1) & (px[:, 0] > 0) & (px[:, 0] < width) & (px[:, 1] > 0) & (px[:, 1] < height)
            img = _render(px, vis, width, height, rng)
            name = f"{int(t * 1e9)}.png"
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(base, "cam0", "data", name)
            )
            f.write(f"{int(t * 1e9)},{name}\n")

    # ground truth
    with open(os.path.join(base, "state_groundtruth_estimate0", "data.csv"), "w") as f:
        f.write(
            "#timestamp, p_RS_R_x [m], p_RS_R_y [m], p_RS_R_z [m], "
            "q_RS_w [], q_RS_x [], q_RS_y [], q_RS_z [], "
            "v_RS_R_x [m s^-1], v_RS_R_y [m s^-1], v_RS_R_z [m s^-1]\n"
        )
        for t in frame_times:
            xi = sim.full_state(jnp.asarray(float(t)))
            q = rotation_to_quaternion(np.asarray(xi.sensor.pose.R))
            p = np.asarray(xi.sensor.pose.x)
            v = np.asarray(xi.sensor.pose.R) @ np.asarray(xi.sensor.velocity)
            f.write(
                f"{int(t * 1e9)},"
                + ",".join(f"{x:.9f}" for x in [*p, *q, *v])
                + "\n"
            )

    return sim


def generate_uzhfpv_dataset(
    out_dir: str,
    end_time: float = 4.0,
    imu_freq: float = 200.0,
    frame_freq: float = 10.0,
    width: int = 320,
    height: int = 240,
    num_points: int = 300,
    seed: int = 0,
):
    """Write a synthetic UZH-FPV-format tree (imu.txt / left_images.txt /
    kalibr camchain with equidistant model / groundtruth.txt)."""
    from PIL import Image

    sim = Simulator.create(
        kind="wave", end_time=end_time + 1.0, num_points=num_points, num_walls=4,
        seed=seed,
    )
    fx = fy = 140.0
    cx, cy = width / 2, height / 2
    dist = (0.01, -0.005, 0.001, 0.0)

    os.makedirs(os.path.join(out_dir, "img"), exist_ok=True)
    rng = np.random.default_rng(seed)
    t0 = 0.2

    imu_times = np.arange(t0, end_time, 1.0 / imu_freq)
    imu = sim.get_imu_batch(jnp.asarray(imu_times))
    with open(os.path.join(out_dir, "imu.txt"), "w") as f:
        f.write("# id timestamp wx wy wz ax ay az\n")
        for i, (t, g, a) in enumerate(zip(imu_times, np.asarray(imu.gyr), np.asarray(imu.acc))):
            f.write(f"{i} {t:.9f} " + " ".join(f"{v:.9f}" for v in [*g, *a]) + "\n")

    # kalibr camchain with equidistant distortion; T_cam_imu = inverse offset
    from ..camera import EquidistantCamera

    cam = EquidistantCamera.create(fx, fy, cx, cy, dist, width, height)
    T_BS = np.eye(4)
    T_BS[:3, :3] = np.asarray(sim.camera_offset.R)
    T_BS[:3, 3] = np.asarray(sim.camera_offset.x)
    T_cam_imu = np.linalg.inv(T_BS)
    with open(os.path.join(out_dir, "camchain-imucam.yaml"), "w") as f:
        import yaml as _yaml

        _yaml.safe_dump(
            {
                "cam0": {
                    "camera_model": "pinhole",
                    "distortion_model": "equidistant",
                    "intrinsics": [fx, fy, cx, cy],
                    "distortion_coeffs": list(dist),
                    "resolution": [width, height],
                    "T_cam_imu": T_cam_imu.tolist(),
                }
            },
            f,
        )

    frame_times = np.arange(t0 + 1.0 / frame_freq, end_time, 1.0 / frame_freq)
    with open(os.path.join(out_dir, "left_images.txt"), "w") as f:
        f.write("# id timestamp image_name\n")
        for i, t in enumerate(frame_times):
            pose = sim.interpolate_pose(jnp.asarray(t))
            cam_inv = se3_inv(se3_mul(pose, sim.camera_offset))
            pts = jnp.einsum("ij,pj->pi", cam_inv.R, sim.world) + cam_inv.x
            px = np.asarray(cam.project(pts))
            z = np.asarray(pts)[:, 2]
            vis = (z > 0.1) & (px[:, 0] > 0) & (px[:, 0] < width) & (px[:, 1] > 0) & (px[:, 1] < height)
            img = _render(px, vis, width, height, rng)
            name = f"img/image_{i}.png"
            Image.fromarray((img * 255).astype(np.uint8)).save(os.path.join(out_dir, name))
            f.write(f"{i} {t:.9f} {name}\n")

    with open(os.path.join(out_dir, "groundtruth.txt"), "w") as f:
        f.write("# id timestamp tx ty tz qx qy qz qw\n")
        for i, t in enumerate(frame_times):
            xi = sim.full_state(jnp.asarray(float(t)))
            q = rotation_to_quaternion(np.asarray(xi.sensor.pose.R))
            p = np.asarray(xi.sensor.pose.x)
            f.write(f"{i} {t:.9f} " + " ".join(
                f"{v:.9f}" for v in [*p, q[1], q[2], q[3], q[0]]) + "\n")

    return sim
