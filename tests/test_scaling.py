"""Sequence-parallel scaling on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from eqvio_tpu import filter as F
from eqvio_tpu.parallel import make_mesh
from eqvio_tpu.runner import build_sim_runner, prepare_sim_inputs


def test_sharded_batch_runner():
    """The batched whole-sequence runner executes with the batch axis sharded
    over all devices and matches the unsharded result."""
    n_dev = len(jax.devices())
    settings = F.Settings(
        measurement_noise=0.5, coordinate_choice="invdepth", fast_riccati=True,
        use_discrete_innovation_lift=False, use_median_depth=False,
        initial_scene_depth=2.5,
    )
    inputs = prepare_sim_inputs(
        settings, capacity=8, max_features=6, end_time=3.0, dtype=jnp.float32
    )
    mesh = make_mesh({"seq": n_dev})
    run_sharded = build_sim_runner(
        settings, inputs, augment_true_landmarks=False, compute_nees=False,
        batch=n_dev, mesh=mesh,
    )
    run_local = build_sim_runner(
        settings, inputs, augment_true_landmarks=False, compute_nees=False,
        batch=n_dev,
    )
    res_s = run_sharded()
    res_l = run_local()
    assert not np.any(np.isnan(np.asarray(res_s.est_position)))
    np.testing.assert_allclose(
        np.asarray(res_s.est_position), np.asarray(res_l.est_position), atol=1e-3
    )
    # every instance identical (same inputs) — sanity of the broadcast
    np.testing.assert_allclose(
        np.asarray(res_s.est_position[0]), np.asarray(res_s.est_position[-1]), atol=1e-3
    )


def test_fleet_runner_distinct_sequences():
    """K distinct-world sequences in one vmapped program match individual runs."""
    from eqvio_tpu.runner import (
        ate_rmse, build_fleet_runner, prepare_sim_inputs, run_prepared,
    )

    settings = F.Settings(
        measurement_noise=0.5, coordinate_choice="invdepth", fast_riccati=True,
        use_discrete_innovation_lift=False, use_median_depth=False,
        initial_scene_depth=2.5,
    )
    inputs = [
        prepare_sim_inputs(settings, capacity=8, max_features=6, end_time=3.0,
                           seed=k, dtype=jnp.float64)
        for k in range(3)
    ]
    fleet = build_fleet_runner(settings, inputs)
    res = fleet()
    assert res.est_position.shape[0] == 3
    assert not np.any(np.isnan(np.asarray(res.est_position)))
    # lane k equals the individual run for seed k
    for k in range(3):
        solo = run_prepared(settings, inputs[k], augment_true_landmarks=False,
                            compute_nees=False)
        np.testing.assert_allclose(
            np.asarray(res.est_position[k]), np.asarray(solo.est_position), atol=1e-8
        )
    # distinct worlds -> distinct trajectories of estimation error
    assert np.abs(np.asarray(res.est_position[0]) - np.asarray(res.est_position[1])).max() > 1e-6
