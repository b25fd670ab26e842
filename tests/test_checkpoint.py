"""Checkpoint/resume round-trip and mid-run resume equivalence."""

import jax.numpy as jnp
import numpy as np

from eqvio_tpu import filter as F
from eqvio_tpu.checkpoint import load_checkpoint, save_checkpoint
from eqvio_tpu.frontend import TrackerConfig, tracker_init


def test_checkpoint_roundtrip(tmp_path):
    settings = F.Settings()
    state = F.init_state(settings, 8)
    tracker = tracker_init(TrackerConfig(max_features=8, max_level=2), (64, 96))
    path = str(tmp_path / "ckpt.npz")
    cursor = {"frame": 42, "imu": 420}
    save_checkpoint(path, state, tracker, cursor)

    state2, tracker2, cursor2, _ = load_checkpoint(path)
    assert cursor2 == cursor
    np.testing.assert_array_equal(np.asarray(state.Sigma), np.asarray(state2.Sigma))
    np.testing.assert_array_equal(np.asarray(state.xi0.ids), np.asarray(state2.xi0.ids))
    np.testing.assert_array_equal(
        np.asarray(state.X.Q.R), np.asarray(state2.X.Q.R)
    )
    np.testing.assert_array_equal(
        np.asarray(tracker.positions), np.asarray(tracker2.positions)
    )
    assert len(tracker2.pyramid) == len(tracker.pyramid)


def test_resume_equivalence(tmp_path):
    """Stop mid-sequence, resume from checkpoint, get identical results."""
    import jax

    from eqvio_tpu.runner import default_sim_camera
    from eqvio_tpu.states import IMU

    settings = F.Settings(measurement_noise=0.5)
    cam = default_sim_camera()
    suite = settings.suite
    N = 8
    rng = np.random.default_rng(5)

    def rand_frame(k):
        r = np.random.default_rng(k)
        imu = IMU(
            stamp=jnp.asarray(np.full(4, 0.02 * k)),
            gyr=jnp.asarray(r.normal(size=(4, 3)) * 0.01),
            acc=jnp.asarray(r.normal(size=(4, 3)) * 0.01 + np.array([0, 0, 9.81])),
            gyr_bias_vel=jnp.zeros((4, 3)),
            acc_bias_vel=jnp.zeros((4, 3)),
        )
        dts = jnp.full(4, 0.005)
        pixels = jnp.asarray(r.uniform(200, 400, size=(N, 2)))
        vis = jnp.ones(N, dtype=bool)
        ids = jnp.arange(N, dtype=jnp.int32)
        return imu, dts, pixels, vis, ids

    def step(state, k):
        imu, dts, pixels, vis, ids = rand_frame(k)
        state = F.propagate_window(state, imu, dts, settings, suite)
        return F.process_vision(state, pixels, vis, ids, cam, settings, suite)

    # straight-through run
    s = F.init_state(settings, N)
    s = s._replace(t=jnp.asarray(0.0))
    for k in range(6):
        s = step(s, k)

    # checkpointed run
    s2 = F.init_state(settings, N)
    s2 = s2._replace(t=jnp.asarray(0.0))
    for k in range(3):
        s2 = step(s2, k)
    path = str(tmp_path / "mid.npz")
    save_checkpoint(path, s2, cursor={"k": 3})
    s3, _, cursor, _ = load_checkpoint(path)
    for k in range(cursor["k"], 6):
        s3 = step(s3, k)

    np.testing.assert_allclose(np.asarray(s.Sigma), np.asarray(s3.Sigma), atol=1e-12)
    np.testing.assert_allclose(np.asarray(s.X.A.x), np.asarray(s3.X.A.x), atol=1e-12)


def test_csv_line_roundtrip():
    """Reference-format [xi0, X, Sigma] CSV line round-trips exactly
    (VIO_eqf.cpp:247, VIO_eqf.h:125-133)."""
    from eqvio_tpu.checkpoint import state_from_csv_line, state_to_csv_line
    from .utils import reasonable_group, reasonable_state

    rng = np.random.default_rng(3)
    n, n_active = 6, 4
    xi0 = reasonable_state(rng, n, n_active)
    X = reasonable_group(rng, n)
    D = 21 + 3 * n
    M = rng.normal(size=(D, D))
    Sigma = jnp.asarray(M @ M.T + np.eye(D))
    state = F.EqFState(xi0=xi0, X=X, Sigma=Sigma, t=jnp.asarray(1.5))

    settings = F.Settings()
    line = state_to_csv_line(state, settings)
    # parse back at a LARGER capacity: active content must be preserved
    st2 = state_from_csv_line(line, capacity=n + 3, settings=settings)
    assert int(st2.xi0.mask.sum()) == n_active
    np.testing.assert_array_equal(
        np.asarray(st2.xi0.ids[:n_active]), np.asarray(xi0.ids[:n_active])
    )
    np.testing.assert_allclose(
        np.asarray(st2.xi0.landmarks[:n_active]),
        np.asarray(xi0.landmarks[:n_active]), atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(st2.xi0.sensor.pose.R), np.asarray(xi0.sensor.pose.R), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(st2.X.Q.R[:n_active]), np.asarray(X.Q.R[:n_active]), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(st2.X.Q.a[:n_active]), np.asarray(X.Q.a[:n_active]), atol=1e-12
    )
    d = 21 + 3 * n_active
    np.testing.assert_allclose(
        np.asarray(st2.Sigma[:d, :d]), np.asarray(Sigma[:d, :d]), atol=1e-10
    )
