"""Camera model tests: projection round-trips and Jacobians for all models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eqvio_tpu.camera import EquidistantCamera, PinholeCamera, RadTanCamera

CAMS = {
    "pinhole": PinholeCamera.create(400.0, 410.0, 376.0, 240.0, 752, 480),
    "radtan": RadTanCamera.create(
        458.6, 457.3, 367.2, 248.4, (-0.28, 0.07, 2e-4, 1.76e-5), 752, 480
    ),
    "equidistant": EquidistantCamera.create(
        278.0, 277.2, 320.0, 242.0, (-0.013, 0.021, -0.020, 0.0065), 640, 480
    ),
}


def _front_points(rng, n=50):
    p = rng.uniform([-0.5, -0.5, 2.0], [0.5, 0.5, 8.0], size=(n, 3))
    return jnp.asarray(p)


@pytest.mark.parametrize("name", list(CAMS))
def test_undistort_project_roundtrip(name):
    """undistort(project(p)) is the unit bearing of p."""
    rng = np.random.default_rng(1)
    cam = CAMS[name]
    p = _front_points(rng)
    px = cam.project(p)
    bearing = cam.undistort(px)
    expected = np.asarray(p / jnp.linalg.norm(p, axis=-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(bearing), expected, atol=1e-6)


@pytest.mark.parametrize("name", list(CAMS))
def test_projection_jacobian(name):
    """projection_jacobian == AD of project."""
    rng = np.random.default_rng(2)
    cam = CAMS[name]
    p = _front_points(rng, 10)
    J = np.asarray(cam.projection_jacobian(p))
    J_ad = np.asarray(jax.vmap(jax.jacfwd(cam.project))(p))
    np.testing.assert_allclose(J, J_ad, atol=1e-6)


@pytest.mark.parametrize("name", list(CAMS))
def test_in_domain(name):
    cam = CAMS[name]
    behind = jnp.asarray([[0.0, 0.0, -3.0]])
    front = jnp.asarray([[0.0, 0.0, 3.0]])
    assert not bool(cam.is_in_domain(behind)[0])
    assert bool(cam.is_in_domain(front)[0])
