"""Image pyramids for coarse-to-fine tracking (GIFT ``maxLevel`` equivalent)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _blur_downsample(img: jnp.ndarray) -> jnp.ndarray:
    """5-tap binomial blur + 2x decimation."""
    k = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0], img.dtype) / 16.0
    kern = k[:, None] * k[None, :]
    out = jax.lax.conv_general_dilated(
        img[None, None, :, :],
        kern[None, None, :, :],
        window_strides=(2, 2),
        padding="SAME",
    )[0, 0]
    return out


def build_pyramid(img: jnp.ndarray, levels: int) -> list[jnp.ndarray]:
    """List of ``levels`` images, level 0 = full resolution."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(_blur_downsample(pyr[-1]))
    return pyr
