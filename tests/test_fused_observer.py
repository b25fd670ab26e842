"""Fused window observer == chained per-sample discrete lifts."""

import jax
import jax.numpy as jnp
import numpy as np

from eqvio_tpu import filter as F
from eqvio_tpu import group as G
from eqvio_tpu.states import IMU

from .utils import random_imu, reasonable_group, reasonable_state, state_distance


def test_fused_window_matches_stepwise():
    rng = np.random.default_rng(17)
    N, K = 6, 10
    settings = F.Settings(fast_riccati=True, use_discrete_velocity_lift=True)
    suite = settings.suite

    xi0 = reasonable_state(rng, N)
    state = F.init_state(settings, N)
    state = state._replace(
        xi0=xi0, X=reasonable_group(rng, N), t=jnp.asarray(0.0)
    )

    imu_win = IMU(
        stamp=jnp.asarray(np.linspace(0, 0.045, K)),
        gyr=jnp.asarray(rng.normal(size=(K, 3)) * 0.2),
        acc=jnp.asarray(rng.normal(size=(K, 3)) * 0.2 + np.array([0, 0, 9.8])),
        gyr_bias_vel=jnp.zeros((K, 3)),
        acc_bias_vel=jnp.zeros((K, 3)),
    )
    dts = jnp.full((K,), 0.005)

    fused = F.propagate_window(state, imu_win, dts, settings, suite)

    # reference path: per-sample observer integration
    step = state
    for k in range(K):
        imu_k = jax.tree.map(lambda a: a[k], imu_win)
        step = F.integrate_observer(step, imu_k, dts[k], settings)

    est_f = F.state_estimate(fused)
    est_s = F.state_estimate(step)
    assert state_distance(est_f, est_s) < 1e-10

    # group elements also agree up to landmark stabiliser (compare estimates
    # and the sensor components of X directly)
    np.testing.assert_allclose(np.asarray(fused.X.A.x), np.asarray(step.X.A.x), atol=1e-10)
    np.testing.assert_allclose(np.asarray(fused.X.A.R), np.asarray(step.X.A.R), atol=1e-10)
    np.testing.assert_allclose(np.asarray(fused.X.beta), np.asarray(step.X.beta), atol=1e-12)
