"""Checkpoint / resume of the complete pipeline state.

The reference has none (SURVEY.md §5.4: closest analogue is one-shot CSV
serialisation of ``[xi0, X, Sigma]``, ``VIO_eqf.cpp:247``).  Here the full
filter state, tracker state and stream cursor serialise to a single ``.npz``
so a run can stop and resume exactly — including mid-dataset.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from . import filter as F
from .group import VIOGroup
from .lie import SE3, SOT3
from .states import VIOSensorState, VIOState

_STATE_KEYS = [
    "xi0.bias", "xi0.pose.R", "xi0.pose.x", "xi0.velocity",
    "xi0.camoff.R", "xi0.camoff.x", "xi0.landmarks", "xi0.ids", "xi0.mask",
    "X.beta", "X.A.R", "X.A.x", "X.w", "X.B.R", "X.B.x", "X.Q.R", "X.Q.a",
    "Sigma", "t",
]


def _flatten_state(state: F.EqFState) -> dict:
    xi0, X = state.xi0, state.X
    vals = [
        xi0.sensor.bias, xi0.sensor.pose.R, xi0.sensor.pose.x, xi0.sensor.velocity,
        xi0.sensor.camera_offset.R, xi0.sensor.camera_offset.x,
        xi0.landmarks, xi0.ids, xi0.mask,
        X.beta, X.A.R, X.A.x, X.w, X.B.R, X.B.x, X.Q.R, X.Q.a,
        state.Sigma, state.t,
    ]
    return {k: np.asarray(v) for k, v in zip(_STATE_KEYS, vals)}


def _unflatten_state(d: dict, dtype=None) -> F.EqFState:
    g = lambda k: jnp.asarray(d[k]) if dtype is None or d[k].dtype.kind in "ib" else jnp.asarray(d[k], dtype)
    sensor = VIOSensorState(
        bias=g("xi0.bias"),
        pose=SE3(g("xi0.pose.R"), g("xi0.pose.x")),
        velocity=g("xi0.velocity"),
        camera_offset=SE3(g("xi0.camoff.R"), g("xi0.camoff.x")),
    )
    xi0 = VIOState(sensor, g("xi0.landmarks"), jnp.asarray(d["xi0.ids"]),
                   jnp.asarray(d["xi0.mask"]))
    X = VIOGroup(
        beta=g("X.beta"),
        A=SE3(g("X.A.R"), g("X.A.x")),
        w=g("X.w"),
        B=SE3(g("X.B.R"), g("X.B.x")),
        Q=SOT3(g("X.Q.R"), g("X.Q.a")),
    )
    return F.EqFState(xi0=xi0, X=X, Sigma=g("Sigma"), t=g("t"))


def save_checkpoint(
    path: str,
    state: F.EqFState,
    tracker=None,
    cursor: dict | None = None,
    rng_key=None,
):
    """Save filter (+ optional tracker state, stream cursor, RNG key) to ``path``."""
    out = _flatten_state(jax.device_get(state))
    if tracker is not None:
        out["trk.positions"] = np.asarray(tracker.positions)
        out["trk.ids"] = np.asarray(tracker.ids)
        out["trk.mask"] = np.asarray(tracker.mask)
        out["trk.next_id"] = np.asarray(tracker.next_id)
        for l, lvl in enumerate(tracker.pyramid):
            out[f"trk.pyr{l}"] = np.asarray(lvl)
    if rng_key is not None:
        out["rng_key"] = np.asarray(jax.random.key_data(rng_key))
    out["cursor_json"] = np.frombuffer(
        json.dumps(cursor or {}).encode(), dtype=np.uint8
    )
    np.savez(path, **out)


def load_checkpoint(path: str, dtype=None):
    """Returns ``(state, tracker_or_None, cursor, rng_key_or_None)``."""
    d = dict(np.load(path, allow_pickle=False))
    state = _unflatten_state(d, dtype)
    tracker = None
    if "trk.positions" in d:
        from .frontend.tracker import TrackerState

        levels = sorted(int(k[7:]) for k in d if k.startswith("trk.pyr"))
        tracker = TrackerState(
            positions=jnp.asarray(d["trk.positions"]),
            ids=jnp.asarray(d["trk.ids"]),
            mask=jnp.asarray(d["trk.mask"]),
            next_id=jnp.asarray(d["trk.next_id"]),
            pyramid=tuple(jnp.asarray(d[f"trk.pyr{l}"]) for l in levels),
        )
    cursor = json.loads(bytes(d["cursor_json"].tobytes()).decode() or "{}")
    rng_key = None
    if "rng_key" in d:
        rng_key = jax.random.wrap_key_data(jnp.asarray(d["rng_key"]))
    return state, tracker, cursor, rng_key
