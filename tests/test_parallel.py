"""Sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eqvio_tpu import filter as F
from eqvio_tpu import states as S
from eqvio_tpu.parallel import (
    batch_sim_step,
    make_batched_states,
    make_mesh,
    shard_batch,
    sharded_vision_update,
)
from eqvio_tpu.runner import default_sim_camera

from .utils import reasonable_state


def test_mesh_creation():
    mesh = make_mesh()
    assert mesh.shape["seq"] == len(jax.devices())


def test_sharded_vision_update_matches_reference():
    """Landmark-sharded update == single-device update bit-for-bit-ish."""
    rng = np.random.default_rng(21)
    cam = default_sim_camera()
    settings = F.Settings(measurement_noise=0.5)
    N = 16
    xi0 = reasonable_state(rng, N, n_active=12)
    state = F.init_state(settings, N)
    state = state._replace(xi0=xi0)

    pix_true, _ = S.measure_system(xi0, cam)
    pixels = pix_true + jnp.asarray(rng.normal(size=(N, 2)) * 0.5)
    vis = jnp.asarray(np.concatenate([np.ones(12, bool), np.zeros(4, bool)]))

    ref = F.update_vision(state, pixels, vis, cam, settings)

    mesh = make_mesh({"lm": 8})
    upd = sharded_vision_update(mesh, settings, cam)
    out = jax.jit(upd)(state, pixels, vis)

    np.testing.assert_allclose(np.asarray(out.Sigma), np.asarray(ref.Sigma), atol=1e-9)
    np.testing.assert_allclose(np.asarray(out.X.A.R), np.asarray(ref.X.A.R), atol=1e-10)
    np.testing.assert_allclose(np.asarray(out.X.Q.a), np.asarray(ref.X.Q.a), atol=1e-10)


def test_batched_sharded_step_runs():
    """A batch of sequences steps under jit with the batch axis sharded."""
    n_dev = len(jax.devices())
    settings = F.Settings(measurement_noise=0.5)
    cam = default_sim_camera()
    B, N, K = n_dev, 8, 4
    mesh = make_mesh({"seq": n_dev})
    states = make_batched_states(settings, B, N, dtype=jnp.float64)
    states = shard_batch(mesh, states)

    rng = np.random.default_rng(3)
    imu_win = S.IMU(
        stamp=jnp.zeros((B, K)),
        gyr=jnp.asarray(rng.normal(size=(B, K, 3)) * 0.01),
        acc=jnp.asarray(rng.normal(size=(B, K, 3)) * 0.01 + np.array([0, 0, 9.81])),
        gyr_bias_vel=jnp.zeros((B, K, 3)),
        acc_bias_vel=jnp.zeros((B, K, 3)),
    )
    dts = jnp.full((B, K), 0.005)
    pixels = jnp.asarray(rng.uniform(100, 500, size=(B, N, 2)))
    vis = jnp.ones((B, N), dtype=bool)
    ids = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))

    step = jax.jit(batch_sim_step(settings, cam))
    out = step(states, imu_win, dts, pixels, vis, ids)
    assert not np.any(np.isnan(np.asarray(out.Sigma)))
    assert np.asarray(out.xi0.mask).sum() > 0
