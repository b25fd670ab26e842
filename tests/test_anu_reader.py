"""ANU (AP) dataset reader on a handcrafted minimal tree."""

import os

import numpy as np


def test_anu_reader(tmp_path):
    from eqvio_tpu.data import APDatasetReader

    base = str(tmp_path) + "/"
    with open(base + "mav_imu.csv", "w") as f:
        f.write("stamp,wx,wy,wz,ax,ay,az\n")
        for i in range(20):
            f.write(f"{0.1*i:.3f},0.01,0.02,0.03,0.1,0.2,9.8\n")
    os.makedirs(base + "frames", exist_ok=True)
    with open(base + "cam.csv", "w") as f:
        f.write("stamp,filename\n")
        for i in range(3):
            f.write(f"{0.5*i:.3f},frame_{i}.png\n")
    with open(base + "undistort.yaml", "w") as f:
        f.write(
            "%YAML:1.0\n---\n"
            "camera_matrix: !!opencv-matrix\n"
            "  rows: 3\n  cols: 3\n  dt: d\n"
            "  data: [300., 0., 320., 0., 301., 240., 0., 0., 1.]\n"
            "dist_coeffs: !!opencv-matrix\n"
            "  rows: 1\n  cols: 4\n  dt: d\n"
            "  data: [0.01, -0.002, 0.001, 0.0]\n"
        )
    with open(base + "ground_truth.csv", "w") as f:
        f.write("stamp,px,py,pz,qw,qx,qy,qz\n")
        for i in range(10):
            f.write(f"{0.2*i:.3f},{0.1*i},0,0,1,0,0,0\n")

    reader = APDatasetReader(base)
    assert len(reader.imu.stamps) == 20
    np.testing.assert_allclose(reader.imu.gyr[0], [0.01, 0.02, 0.03])
    assert len(reader.images.stamps) == 3
    assert reader.camera.model == "equidistant"
    np.testing.assert_allclose(reader.camera.intrinsics, (300.0, 301.0, 320.0, 240.0))
    np.testing.assert_allclose(reader.camera.distortion, (0.01, -0.002, 0.001, 0.0))
    assert reader.groundtruth is not None
    assert len(reader.groundtruth.stamps) == 10
