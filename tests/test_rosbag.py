"""Rosbag / Hilti readers on hermetic, self-written v2.0 bags.

Mirrors the reference's rosbag path (RosbagDatasetReader.cpp /
HiltiDatasetReader.cpp) without needing ROS: bags are written with the
module's own minimal writer, then read back through the standard reader
protocol and the DataServer merge.
"""

import numpy as np
import pytest


def _write_bag(path, imu_topic="/imu0", image_topic="/cam0/image_raw",
               compression="none", n_imu=40, n_img=4):
    from eqvio_tpu.data import BagWriter

    rng = np.random.default_rng(0)
    w = BagWriter(str(path), imu_topic, image_topic, compression=compression)
    imgs = []
    for i in range(n_imu):
        w.write_imu(100.0 + 0.01 * i, [0.01, 0.02 * i, 0.03], [0.1, 0.2, 9.81])
    for k in range(n_img):
        img = rng.uniform(0.0, 1.0, size=(24, 32))
        imgs.append(np.round(img * 255) / 255.0)
        w.write_image(100.0 + 0.1 * k, imgs[-1])
    w.close()
    return imgs


@pytest.mark.parametrize("compression", ["none", "bz2"])
def test_rosbag_reader_roundtrip(tmp_path, compression):
    from eqvio_tpu.data import create_dataset_reader

    imgs = _write_bag(tmp_path / "seq.bag", compression=compression)
    with open(tmp_path / "intrinsics.yaml", "w") as f:
        f.write(
            "resolution: [32, 24]\n"
            "intrinsics: [30.0, 31.0, 16.0, 12.0]\n"
            "distortion_coefficients: [0.01, -0.002, 0.0, 0.0]\n"
            "T_BS:\n  data: [1,0,0, 0.1, 0,1,0, 0.0, 0,0,1, 0.0, 0,0,0,1]\n"
        )

    reader = create_dataset_reader("rosbag", str(tmp_path / "seq.bag"))
    assert len(reader.imu.stamps) == 40
    np.testing.assert_allclose(reader.imu.stamps[0], 100.0)
    np.testing.assert_allclose(reader.imu.gyr[3], [0.01, 0.06, 0.03])
    np.testing.assert_allclose(reader.imu.acc[0], [0.1, 0.2, 9.81])

    assert len(reader.images.stamps) == 4
    np.testing.assert_allclose(reader.images.stamps, 100.0 + 0.1 * np.arange(4))
    for k in (0, 3):
        np.testing.assert_allclose(reader.load_image(k), imgs[k], atol=1e-6)

    assert reader.camera is not None
    assert reader.camera.model == "radtan"
    np.testing.assert_allclose(reader.camera.intrinsics, (30.0, 31.0, 16.0, 12.0))
    np.testing.assert_allclose(reader.camera.T_BS[0, 3], 0.1)
    assert reader.groundtruth is None


def test_rosbag_dataserver_merge(tmp_path):
    from eqvio_tpu.data import DataServer, RosbagDatasetReader

    _write_bag(tmp_path / "seq.bag")
    server = DataServer(RosbagDatasetReader(str(tmp_path / "seq.bag")))
    kinds = [(m.kind, m.stamp) for m in server]
    stamps = [s for _, s in kinds]
    assert sorted(stamps) == stamps
    assert sum(1 for k, _ in kinds if k == "image") == 4
    assert sum(1 for k, _ in kinds if k == "imu") == 40


def test_hilti_reader(tmp_path):
    from eqvio_tpu.data import create_dataset_reader

    _write_bag(
        tmp_path / "run.bag",
        imu_topic="/alphasense/imu",
        image_topic="/alphasense/cam0/image_raw",
        n_imu=10,
        n_img=2,
    )
    # Hilti challenge calibration layout (HiltiDatasetReader.cpp:21-52);
    # quaternion is xyzw — a 90 deg yaw here.
    s = float(np.sqrt(0.5))
    with open(tmp_path / "calibration.yaml", "w") as f:
        f.write(
            "sensors:\n"
            "  cam0:\n"
            "    intrinsics:\n"
            "      parameters:\n"
            "        image_size: [32, 24]\n"
            "        fx: 30.0\n        fy: 31.0\n        cx: 16.0\n        cy: 12.0\n"
            "        k1: 0.01\n        k2: 0.002\n        k3: 0.0\n        k4: 0.0\n"
            "    extrinsics:\n"
            f"      quaternion: [0.0, 0.0, {s}, {s}]\n"
            "      translation: [0.1, 0.2, 0.3]\n"
        )
    reader = create_dataset_reader(
        "hilti", str(tmp_path / "run.bag"), str(tmp_path / "calibration.yaml")
    )
    assert len(reader.imu.stamps) == 10
    assert len(reader.images.stamps) == 2
    assert reader.camera.model == "equidistant"
    np.testing.assert_allclose(reader.camera.distortion, (0.01, 0.002, 0.0, 0.0))
    # 90 deg yaw rotation: R @ e_x = e_y
    np.testing.assert_allclose(
        reader.camera.T_BS[:3, :3] @ np.array([1.0, 0, 0]), [0.0, 1.0, 0.0], atol=1e-12
    )
    np.testing.assert_allclose(reader.camera.T_BS[:3, 3], [0.1, 0.2, 0.3])
