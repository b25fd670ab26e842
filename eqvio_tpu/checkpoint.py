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


def state_to_csv_line(state: F.EqFState, settings: F.Settings) -> str:
    """Serialise the filter state to one CSV line: ``[xi0, X, Sigma]``.

    Mirrors the reference's ``operator<<(CSVLine&, const VIO_eqf&)``
    (``VIO_eqf.cpp:247``, format documented at ``VIO_eqf.h:125-133``):

    - ``xi0`` = pose (x, quat wxyz), velocity, cameraOffset (x, quat), bias,
      N, then per landmark ``id, p`` (``VIOState.cpp:80-92``,
      SE3 CSV order ``CSVLine.h:248``);
    - ``X`` = beta, A (x, quat), w, B (x, quat), N, then per landmark
      ``id, Q.a, Q.quat`` (``VIOGroup.cpp:132-139``, SOT3 order
      ``CSVLine.h:263``);
    - ``Sigma`` = the (21+3N)^2 entries row-major (``CSVLine.h:186``).

    Only active landmark slots are written, in slot order, so the line is
    capacity-independent; masked slots of Sigma are dropped accordingly.

    ``settings`` is REQUIRED (not defaulted): in sqrt-covariance mode the
    state carries the Cholesky factor, and a caller that forgot the flag
    would otherwise silently serialise the factor as the dense covariance.
    """
    from .io.writer import rotation_to_quaternion as r2q

    st = jax.device_get(state)
    xi0, X = st.xi0, st.X
    sl = np.flatnonzero(np.asarray(xi0.mask))
    n = len(sl)
    vals: list = []

    def se3(R, x):
        vals.extend(np.asarray(x).ravel())
        vals.extend(r2q(np.asarray(R)))

    sensor = xi0.sensor
    se3(sensor.pose.R, sensor.pose.x)
    vals.extend(np.asarray(sensor.velocity))
    se3(sensor.camera_offset.R, sensor.camera_offset.x)
    vals.extend(np.asarray(sensor.bias))
    vals.append(n)
    lms, ids = np.asarray(xi0.landmarks), np.asarray(xi0.ids)
    for i in sl:
        vals.append(int(ids[i]))
        vals.extend(lms[i])
    vals.extend(np.asarray(X.beta))
    se3(X.A.R, X.A.x)
    vals.extend(np.asarray(X.w))
    se3(X.B.R, X.B.x)
    vals.append(n)
    Qa, QR = np.asarray(X.Q.a), np.asarray(X.Q.R)
    for i in sl:
        vals.append(int(ids[i]))
        vals.append(Qa[i])
        vals.extend(r2q(QR[i]))
    keep = np.concatenate([np.arange(21), (21 + 3 * sl[:, None] + np.arange(3)).ravel()]) \
        if n else np.arange(21)
    # reference format carries the DENSE covariance; reconstruct from the
    # Cholesky factor in sqrt mode
    Sigma_full = np.asarray(F.dense_sigma(st, settings))
    Sigma = Sigma_full[np.ix_(keep, keep)]
    vals.extend(Sigma.ravel())
    return ", ".join(
        str(v) if isinstance(v, int) else f"{float(v):.17g}" for v in vals
    )


def state_from_csv_line(line: str, capacity: int, settings: F.Settings,
                        dtype=None, t: float = 0.0) -> F.EqFState:
    """Parse a :func:`state_to_csv_line` line back into an ``EqFState``.

    Landmarks land in slots ``0..N-1`` of a ``capacity``-slot state; the
    masked remainder of Sigma carries identity rows (harmless — inactive).
    ``t``: the filter time to stamp the state with — the reference stores it
    in a separate CSV column, not inside the ``[xi0, X, Sigma]`` blob."""
    from .analysis import quat_to_rot

    tok = [t.strip() for t in line.split(",")]
    pos = [0]

    def take(k):
        out = np.array([float(t) for t in tok[pos[0]:pos[0] + k]])
        pos[0] += k
        return out

    def se3():
        x = take(3)
        return quat_to_rot(take(4)), x

    dtype = dtype or jnp.zeros(0).dtype
    Rp, xp = se3()
    vel = take(3)
    Rc, xc = se3()
    bias = take(6)
    n = int(take(1)[0])
    if n > capacity:
        raise ValueError(f"{n} landmarks > capacity {capacity}")
    from .states import DUMMY_POINT

    ids = np.full(capacity, -1, np.int32)
    lms = np.tile(np.asarray(DUMMY_POINT, float), (capacity, 1))
    for i in range(n):
        ids[i] = int(take(1)[0])
        lms[i] = take(3)
    mask = np.arange(capacity) < n
    beta = take(6)
    RA, xA = se3()
    w = take(3)
    RB, xB = se3()
    n2 = int(take(1)[0])
    if n2 != n:
        raise ValueError(f"malformed state line: X has {n2} landmarks, xi0 has {n}")
    Qa = np.ones(capacity)
    QR = np.tile(np.eye(3), (capacity, 1, 1))
    for i in range(n2):
        take(1)  # id (already recorded from xi0)
        Qa[i] = take(1)[0]
        QR[i] = quat_to_rot(take(4))
    d = 21 + 3 * n
    Sig = take(d * d).reshape(d, d)
    D = 21 + 3 * capacity
    Sigma = np.eye(D)
    Sigma[:d, :d] = Sig
    if settings is not None and settings.sqrt_covariance:
        Sigma = np.linalg.cholesky(Sigma)
    a = lambda v: jnp.asarray(v, dtype)
    sensor = VIOSensorState(bias=a(bias), pose=SE3(a(Rp), a(xp)),
                            velocity=a(vel), camera_offset=SE3(a(Rc), a(xc)))
    xi0 = VIOState(sensor, a(lms), jnp.asarray(ids), jnp.asarray(mask))
    X = VIOGroup(beta=a(beta), A=SE3(a(RA), a(xA)), w=a(w), B=SE3(a(RB), a(xB)),
                 Q=SOT3(a(QR), a(Qa)))
    return F.EqFState(xi0=xi0, X=X, Sigma=a(Sigma), t=a(t))


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
