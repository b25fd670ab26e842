"""Coordinate chart round-trips and differentials (mirrors test_CoordinateCharts.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eqvio_tpu import charts as C
from eqvio_tpu.states import VIOState

from .utils import reasonable_state, state_distance

N = 5
REPS = 10


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _random_sphere(rng, n=REPS):
    v = rng.normal(size=(n, 3))
    return jnp.asarray(v / np.linalg.norm(v, axis=-1, keepdims=True))


def test_sphere_stereo_roundtrip(rng):
    eta = _random_sphere(rng)
    pole = _random_sphere(rng)
    # keep eta away from the antipode of the pole where the chart blows up
    flip = np.asarray(jnp.sum(eta * pole, axis=-1)) < -0.5
    eta = jnp.where(jnp.asarray(flip)[:, None], -eta, eta)
    y = C.sphere_chart_stereo.chart(eta, pole)
    eta_back = C.sphere_chart_stereo.chart_inv(y, pole)
    np.testing.assert_allclose(eta_back, eta, atol=1e-9)
    # chart at the pole is the origin
    np.testing.assert_allclose(C.sphere_chart_stereo.chart(pole, pole), 0.0, atol=1e-9)


def test_sphere_normal_roundtrip(rng):
    eta = _random_sphere(rng)
    pole = _random_sphere(rng)
    flip = np.asarray(jnp.sum(eta * pole, axis=-1)) < -0.5
    eta = jnp.where(jnp.asarray(flip)[:, None], -eta, eta)
    y = C.sphere_chart_normal.chart(eta, pole)
    eta_back = C.sphere_chart_normal.chart_inv(y, pole)
    np.testing.assert_allclose(eta_back, eta, atol=1e-9)
    np.testing.assert_allclose(C.sphere_chart_normal.chart(pole, pole), 0.0, atol=1e-9)


@pytest.mark.parametrize("chart", ["stereo", "normal"])
def test_sphere_chart_differentials(rng, chart):
    """Analytic diff0 == AD of the chart maps at the origin
    (test_CoordinateCharts.cpp:26-127)."""
    sc = C.sphere_chart_stereo if chart == "stereo" else C.sphere_chart_normal
    poles = _random_sphere(rng)
    for i in range(REPS):
        pole = poles[i]
        D_analytic = sc.chart_diff0(pole)
        # differential of eta -> chart(eta) restricted to the tangent space:
        # compare against AD through chart_inv: D(chart o chart_inv)(0) = I
        Dinv_analytic = sc.chart_inv_diff0(pole)
        J = jax.jacfwd(lambda y: sc.chart(sc.chart_inv(y, pole), pole))(
            jnp.zeros(2, dtype=jnp.float64)
        )
        np.testing.assert_allclose(J, np.eye(2), atol=1e-7)
        # chain rule: chart_diff0 @ chart_inv_diff0 = I
        np.testing.assert_allclose(D_analytic @ Dinv_analytic, np.eye(2), atol=1e-9)
        # AD check of the inverse differential directly
        J_inv = jax.jacfwd(lambda y: sc.chart_inv(y, pole))(jnp.zeros(2, dtype=jnp.float64))
        np.testing.assert_allclose(J_inv, Dinv_analytic, atol=1e-7)


@pytest.mark.parametrize("name", ["euclid", "invdepth", "normal"])
def test_state_chart_roundtrip(rng, name):
    """chart_inv(chart(xi, xi0), xi0) == xi (test_CoordinateCharts.cpp:128-146)."""
    chart = C.STATE_CHARTS[name]
    for _ in range(REPS):
        xi0 = reasonable_state(rng, N)
        xi = reasonable_state(rng, N)
        eps = chart.chart(xi, xi0)
        xi_back = chart.chart_inv(eps, xi0)
        assert state_distance(xi_back, xi) < 1e-8
        # chart at the origin is zero
        np.testing.assert_allclose(chart.chart(xi0, xi0), 0.0, atol=1e-9)


def test_invdepth_euclid_differential(rng):
    """Analytic inter-chart blocks match AD (test_CoordinateCharts.cpp:148-170)."""
    xi0 = reasonable_state(rng, N)
    euclid = C.STATE_CHARTS["euclid"]
    invdepth = C.STATE_CHARTS["invdepth"]

    def transition(eps):
        return invdepth.chart(euclid.chart_inv(eps, xi0), xi0)

    D = xi0.dim()
    M_num = jax.jacfwd(transition)(jnp.zeros(D, dtype=jnp.float64))
    M_blocks = C.invdepth_euclid_block(xi0.landmarks)
    M_analytic = np.eye(D)
    for i in range(N):
        s = 21 + 3 * i
        M_analytic[s : s + 3, s : s + 3] = np.asarray(M_blocks)[i]
    np.testing.assert_allclose(M_num, M_analytic, atol=1e-7)
    # inverse blocks
    inv_blocks = C.euclid_invdepth_block(xi0.landmarks)
    prod = np.asarray(M_blocks @ inv_blocks)
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), (N, 3, 3)), atol=1e-9)


def test_invdepth_negative_depth_clamp(rng):
    """The inverse-depth chart clamps rho <= 0 (reference VIOState.cpp:180-183)."""
    p0 = jnp.asarray([[0.0, 0.0, 2.0]])
    eps = jnp.asarray([[0.0, 0.0, -1.0]])  # rho = 0.5 - 1.0 < 0
    p = C.point_chart_invdepth_inv(eps, p0)
    assert np.all(np.isfinite(np.asarray(p)))
    assert np.linalg.norm(np.asarray(p)[0]) > 1e5  # pushed to far depth
