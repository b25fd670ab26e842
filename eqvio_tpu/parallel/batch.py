"""Sequence-batch parallelism: run many VIO sequences as one sharded program.

Replaces the reference's serial per-sequence driver
(``scripts/run_and_analyse_dataset.py:46-49``): all sequences step together
under one jit, vmapped over the batch axis and sharded over the ``seq`` mesh
axis, so 11 EuRoC sequences (or thousands of sim rollouts) occupy the whole
slice with zero cross-sequence synchronisation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import filter as F
from ..states import IMU


def make_batched_states(settings: F.Settings, batch: int, capacity: int, dtype=jnp.float32):
    """A batch of freshly-initialised filter states (leading axis = sequence)."""
    one = F.init_state(settings, capacity, dtype)
    return jax.tree.map(lambda a: jnp.broadcast_to(a, (batch,) + a.shape), one)


def batch_sim_step(settings: F.Settings, camera, suite=None):
    """Build a vmapped full frame step: propagate window + vision update.

    Returns ``step(states, imu_windows, dts, pixels, vis, ids) -> states`` where
    every input carries a leading sequence-batch axis.  jit/shard over a
    ``seq`` mesh axis for multi-chip execution.
    """
    if suite is None:
        suite = settings.suite

    def one_step(state, imu_win, dts, pixels, vis, ids):
        state = F.propagate_window(state, imu_win, dts, settings, suite)
        state = F.process_vision(state, pixels, vis, ids, camera, settings, suite)
        return state

    return jax.vmap(one_step)
