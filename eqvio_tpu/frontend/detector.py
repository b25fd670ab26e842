"""Corner detection: Shi-Tomasi/Harris response, NMS, masked top-K selection.

TPU-native equivalent of GIFT's feature detection (used by the reference via
``GIFT::PointFeatureTracker``, ``main_opt.cpp:153-208``; config keys
``maxFeatures / featureDist / minHarrisQuality`` from
``EQVIO_config_template.yaml:52-62``).  Everything is convolutions and
reduce-windows — XLA maps these straight onto the TPU's conv/vector units,
unlike the reference's per-pixel OpenCV loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _conv2(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Same-padding 2-D convolution of a single-channel image."""
    return jax.lax.conv_general_dilated(
        img[None, None, :, :],
        kernel[None, None, :, :],
        window_strides=(1, 1),
        padding="SAME",
    )[0, 0]


def sobel_gradients(img: jnp.ndarray):
    kx = jnp.asarray([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], img.dtype) / 8.0
    ky = kx.T
    return _conv2(img, kx), _conv2(img, ky)


def harris_score(img: jnp.ndarray, window: int = 5) -> jnp.ndarray:
    """Shi-Tomasi (min-eigenvalue) corner response [H, W]."""
    Ix, Iy = sobel_gradients(img)
    box = jnp.ones((window, window), img.dtype) / (window * window)
    Ixx = _conv2(Ix * Ix, box)
    Iyy = _conv2(Iy * Iy, box)
    Ixy = _conv2(Ix * Iy, box)
    half_tr = 0.5 * (Ixx + Iyy)
    disc = jnp.sqrt(jnp.clip((0.5 * (Ixx - Iyy)) ** 2 + Ixy * Ixy, 0.0, None))
    return half_tr - disc  # min eigenvalue


def _max_pool_same(x: jnp.ndarray, size: int) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (size, size), (1, 1), "SAME"
    )


def detect_features(
    img: jnp.ndarray,
    max_features: int,
    min_dist: int = 20,
    quality: float = 0.05,
    border: int = 21,
    exclude: jnp.ndarray | None = None,
    exclude_mask: jnp.ndarray | None = None,
    exclude_dist: float = 20.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Detect up to ``max_features`` corners with non-max suppression.

    ``exclude [M, 2]`` + ``exclude_mask [M]``: existing feature positions to
    stay ``exclude_dist`` away from (GIFT ``trackedFeatureDist``).

    Returns ``(positions [K, 2] (x, y) pixel coords, valid [K])``.
    """
    H, W = img.shape
    score = harris_score(img)
    # quality gate relative to the best corner (GIFT minHarrisQuality)
    peak = jnp.max(score)
    is_max = (score >= _max_pool_same(score, 2 * min_dist + 1) - 1e-12) & (
        score > quality * peak
    )
    # suppress borders
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inside = (
        (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
    )
    cand_score = jnp.where(is_max & inside, score, -jnp.inf)

    # distance-based exclusion around existing features
    if exclude is not None:
        M = exclude.shape[0]
        ex = jnp.where(exclude_mask[:, None], exclude, -1e6)
        d2 = (xs[None].astype(img.dtype) - ex[:, 0, None, None]) ** 2 + (
            ys[None].astype(img.dtype) - ex[:, 1, None, None]
        ) ** 2
        near = jnp.any(d2 < exclude_dist**2, axis=0)
        cand_score = jnp.where(near, -jnp.inf, cand_score)

    flat = cand_score.reshape(-1)
    vals, lin = jax.lax.top_k(flat, max_features)
    pos = jnp.stack(
        [(lin % W).astype(img.dtype), (lin // W).astype(img.dtype)], axis=-1
    )
    valid = jnp.isfinite(vals) & (vals > 0)
    return pos, valid


def equalize_histogram(img: jnp.ndarray, bins: int = 256) -> jnp.ndarray:
    """Histogram equalisation of a [0, 1] image (GIFT ``equaliseImageHistogram``)."""
    flat = jnp.clip(img.reshape(-1), 0.0, 1.0)
    idx = jnp.clip((flat * (bins - 1)).astype(jnp.int32), 0, bins - 1)
    hist = jnp.zeros(bins, dtype=img.dtype).at[idx].add(1.0)
    cdf = jnp.cumsum(hist)
    cdf = (cdf - cdf[0]) / jnp.clip(cdf[-1] - cdf[0], 1.0, None)
    return cdf[idx].reshape(img.shape)
