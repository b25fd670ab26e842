"""Pallas KLT kernel vs the pure-JAX reference implementation (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eqvio_tpu.frontend.klt import _track_level
from eqvio_tpu.frontend.pallas_klt import klt_track_level_pallas

H, W = 128, 384


def render(points, sigma=1.5):
    ys, xs = np.mgrid[0:H, 0:W]
    img = np.zeros((H, W), dtype=np.float32)
    for x, y in points:
        img += np.exp(-((xs - x) ** 2 + (ys - y) ** 2) / (2 * sigma**2))
    return jnp.asarray(np.clip(img, 0, 1))


def test_pallas_klt_matches_reference():
    rng = np.random.default_rng(3)
    pts = rng.uniform([25, 25], [W - 25, H - 25], size=(6, 2)).astype(np.float32)
    shift = np.array([2.3, -1.7], dtype=np.float32)
    img0 = render(pts)
    img1 = render(pts + shift)

    pos = jnp.asarray(pts)
    out_pos, err = klt_track_level_pallas(
        img0, img1, pos, pos, win=15, iters=8, interpret=True
    )
    track_err = np.linalg.norm(np.asarray(out_pos) - (pts + shift), axis=-1)
    assert track_err.max() < 0.3, track_err
    assert np.all(np.asarray(err) < 0.05)


def test_pallas_klt_matches_gather_path():
    """Regression for the round-1 padded-frame bug: the pallas kernel must
    agree with the pure-JAX gather path to sub-0.1 px on a shifted-dot image
    (any pad-offset leak shows up as an exact (128, 8) discrepancy)."""
    rng = np.random.default_rng(7)
    pts = rng.uniform([25, 25], [W - 25, H - 25], size=(8, 2)).astype(np.float32)
    shift = np.array([-1.4, 2.1], dtype=np.float32)
    img0 = render(pts)
    img1 = render(pts + shift)

    pos = jnp.asarray(pts)
    pal_pos, pal_err = klt_track_level_pallas(
        img0, img1, pos, pos, win=15, iters=8, interpret=True
    )
    ref_pos, ref_err = jax.vmap(
        lambda p, g: _track_level(img0, img1, p, g, 15, 8, jnp.float32)
    )(pos, pos)
    d = np.linalg.norm(np.asarray(pal_pos) - np.asarray(ref_pos), axis=-1)
    assert d.max() < 0.1, d


def test_pallas_klt_matches_gather_at_borders():
    """Pallas kernel border semantics == gather path (edge replication):
    features within one window of every border on a coarse-level-sized
    image, where the round-4 MXU border bug lived (interpret mode)."""
    import numpy as np
    import jax.numpy as jnp

    from eqvio_tpu.frontend.klt import _bilinear, _track_level
    from eqvio_tpu.frontend.pallas_klt import klt_track_level_pallas
    from eqvio_tpu.frontend.pyramid import _blur_downsample

    rng = np.random.default_rng(0)
    H, W = 60, 80
    img0 = _blur_downsample(
        jnp.asarray(rng.uniform(0, 1, (2 * H, 2 * W)).astype(np.float32))
    )
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    img1 = _bilinear(img0, jnp.stack([xx - 0.7, yy + 0.4], axis=-1))
    pts = jnp.asarray(
        [[6.0, 30.0], [74.0, 30.0], [40.0, 5.0], [40.0, 55.0],
         [7.0, 7.0], [73.0, 53.0], [40.0, 30.0]], jnp.float32
    )
    win, iters = 21, 8
    pg = jnp.stack(
        [_track_level(img0, img1, p, p, win, iters, jnp.float32)[0] for p in pts]
    )
    pp, _ = klt_track_level_pallas(img0, img1, pts, pts, win=win, iters=iters,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(pp), np.asarray(pg), atol=2e-3)
