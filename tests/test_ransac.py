"""Batched epipolar RANSAC gate: geometry-violating tracks are rejected.

Mirrors the role of GIFT's ransacParams outlier rejection
(``configs/EQVIO_config_EuRoC_stationary.yaml:10-14`` in the reference).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eqvio_tpu.frontend.ransac import ransac_epipolar_mask


def two_view_correspondences(n=24, seed=3, noise=0.0):
    """Project a rigid 3-D point cloud into two pinhole views (pixels)."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-2, -2, 4], [2, 2, 8], size=(n, 3))
    f, cx, cy = 400.0, 320.0, 240.0

    def project(P, R, t):
        Pc = P @ R.T + t
        return np.stack(
            [f * Pc[:, 0] / Pc[:, 2] + cx, f * Pc[:, 1] / Pc[:, 2] + cy], axis=-1
        )

    # view 2: small rotation + translation
    th = 0.06
    R = np.array(
        [
            [np.cos(th), 0, np.sin(th)],
            [0, 1, 0],
            [-np.sin(th), 0, np.cos(th)],
        ]
    )
    t = np.array([0.3, 0.05, 0.1])
    p1 = project(pts, np.eye(3), np.zeros(3))
    p2 = project(pts, R, t)
    if noise:
        p2 = p2 + rng.normal(scale=noise, size=p2.shape)
    return jnp.asarray(p1), jnp.asarray(p2)


def test_ransac_rejects_gross_outliers():
    p1, p2 = two_view_correspondences(noise=0.1)
    n = p1.shape[0]
    bad = np.zeros(n, dtype=bool)
    bad[[2, 7, 13, 20]] = True
    # gross, epipolar-violating corruption of a few tracks
    p2 = p2.at[np.where(bad)[0]].add(jnp.asarray([[37.0, -24.0]] * 4))
    mask = jnp.ones(n, dtype=bool)
    out = ransac_epipolar_mask(
        p1, p2, mask, jax.random.PRNGKey(0), threshold=1.5, hypotheses=128
    )
    out = np.asarray(out)
    assert not out[bad].any(), "corrupted tracks must be rejected"
    assert out[~bad].sum() >= (n - bad.sum()) - 2, "inliers must survive"


def test_ransac_keeps_clean_tracks():
    p1, p2 = two_view_correspondences(noise=0.05)
    mask = jnp.ones(p1.shape[0], dtype=bool)
    out = ransac_epipolar_mask(
        p1, p2, mask, jax.random.PRNGKey(1), threshold=1.5, hypotheses=128
    )
    assert np.asarray(out).sum() >= p1.shape[0] - 1


def test_ransac_respects_input_mask_and_small_n():
    p1, p2 = two_view_correspondences()
    n = p1.shape[0]
    mask = np.zeros(n, dtype=bool)
    mask[:5] = True  # fewer than 8 tracked -> gate must be a no-op
    out = ransac_epipolar_mask(
        p1, p2, jnp.asarray(mask), jax.random.PRNGKey(2), threshold=1.0
    )
    np.testing.assert_array_equal(np.asarray(out), mask)


def test_ransac_min_inliers_guard():
    # pure random correspondence soup: no consensus geometry should reach
    # min_inliers, so the mask must come back unchanged
    rng = np.random.default_rng(0)
    p1 = jnp.asarray(rng.uniform(0, 640, size=(20, 2)))
    p2 = jnp.asarray(rng.uniform(0, 640, size=(20, 2)))
    mask = jnp.ones(20, dtype=bool)
    out = ransac_epipolar_mask(
        p1,
        p2,
        mask,
        jax.random.PRNGKey(3),
        threshold=0.05,
        hypotheses=32,
        min_inliers=18,
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(mask))


def test_ransac_is_jittable_and_subset():
    p1, p2 = two_view_correspondences(noise=0.2)
    mask = jnp.ones(p1.shape[0], dtype=bool).at[0].set(False)
    fn = jax.jit(
        lambda a, b, m, k: ransac_epipolar_mask(a, b, m, k, threshold=2.0)
    )
    out = fn(p1, p2, mask, jax.random.PRNGKey(4))
    out = np.asarray(out)
    assert not out[0], "gate output must stay a subset of the input mask"


def test_smallest_eigvec_matches_eigh():
    """The unrolled inverse-iteration smallest-eigenvector (replacing the
    batched QDWH eigh custom-calls) must match numpy's eigh to f32 round-off
    on realistic 8-point Gram spectra, including near-singular ones."""
    import numpy as np

    from eqvio_tpu.frontend.ransac import smallest_eigvec

    rng = np.random.default_rng(5)
    for n in (3, 9):
        # spectra spanning benign to nearly-null smallest eigenvalue
        for lam_min in (1e-1, 1e-4, 1e-8, 0.0):
            lams = np.sort(rng.uniform(0.5, 4.0, size=(64, n)), axis=1)
            lams[:, 0] = lam_min
            Q, _ = np.linalg.qr(rng.normal(size=(64, n, n)))
            G = np.einsum("kij,kj,klj->kil", Q, lams, Q)
            G = 0.5 * (G + np.swapaxes(G, -1, -2))
            v = np.asarray(smallest_eigvec(jnp.asarray(G, dtype=jnp.float32)))
            v_ref = Q[:, :, 0]
            dots = np.abs(np.sum(v * v_ref, axis=-1))
            # unit alignment with the true minimal eigenvector (sign-free)
            assert dots.min() > 1.0 - 1e-3, (n, lam_min, dots.min())
