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
