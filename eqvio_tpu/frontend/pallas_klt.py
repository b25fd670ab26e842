"""Pallas TPU kernel for Lucas-Kanade patch tracking.

The KLT inner loop is gather-bound: per feature, per iteration, it needs
bilinear patches from two images at fractional positions.  XLA lowers this to
general gathers; this kernel instead keeps both pyramid images resident in
VMEM and extracts patches with dynamic slices (one per feature via the grid),
so the inner iteration runs entirely out of on-chip memory.

Grid: one program per feature.  Patch window is compile-time static
(``win``); images must fit VMEM (true for pyramid levels of VGA-class video:
752 x 480 x f32 = 1.4 MB).

Falls back to the pure-JAX implementation (``klt.py``) off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bilinear_patch(img_ref, x, y, win: int):
    """Bilinear ``win x win`` patch at fractional (x, y) top-left corner.

    Loads a static (win+1, win+1) slice at the integer corner and blends the
    four integer-shifted views — no gathers.
    """
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0.astype(x.dtype)
    fy = y - y0.astype(y.dtype)
    raw = img_ref[pl.ds(y0, win + 1), pl.ds(x0, win + 1)]
    i00 = raw[:win, :win]
    i01 = raw[:win, 1:]
    i10 = raw[1:, :win]
    i11 = raw[1:, 1:]
    return (
        i00 * (1 - fx) * (1 - fy)
        + i01 * fx * (1 - fy)
        + i10 * (1 - fx) * fy
        + i11 * fx * fy
    )


def _klt_kernel(pos_ref, guess_ref, img_prev_ref, img_next_ref,
                out_pos_ref, out_err_ref, *, win: int, iters: int):
    i = pl.program_id(0)
    H = img_prev_ref.shape[0]
    W = img_prev_ref.shape[1]
    r = (win - 1) * 0.5

    px = pos_ref[i, 0]
    py = pos_ref[i, 1]
    # clamp the template corner inside the image
    tx = jnp.clip(px - r, 1.0, W - win - 2.0)
    ty = jnp.clip(py - r, 1.0, H - win - 2.0)

    template = _bilinear_patch(img_prev_ref, tx, ty, win)
    gx = (
        _bilinear_patch(img_prev_ref, tx + 1.0, ty, win)
        - _bilinear_patch(img_prev_ref, tx - 1.0, ty, win)
    )
    gy = (
        _bilinear_patch(img_prev_ref, tx, ty + 1.0, win)
        - _bilinear_patch(img_prev_ref, tx, ty - 1.0, win)
    )
    gxx = jnp.sum(gx * gx)
    gxy = jnp.sum(gx * gy)
    gyy = jnp.sum(gy * gy)
    det = gxx * gyy - gxy * gxy
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)

    def body(_, carry):
        cx, cy, _err = carry
        qx = jnp.clip(cx - r, 1.0, W - win - 2.0)
        qy = jnp.clip(cy - r, 1.0, H - win - 2.0)
        patch = _bilinear_patch(img_next_ref, qx, qy, win)
        diff = patch - template
        bx = jnp.sum(diff * gx)
        by = jnp.sum(diff * gy)
        dx = (gyy * bx - gxy * by) / det
        dy = (gxx * by - gxy * bx) / det
        err = jnp.mean(jnp.abs(diff))
        return cx - dx, cy - dy, err

    gx0 = guess_ref[i, 0]
    gy0 = guess_ref[i, 1]
    fx_, fy_, err = jax.lax.fori_loop(
        0, iters, body, (gx0, gy0, jnp.asarray(jnp.inf, dtype=jnp.float32))
    )
    # correct for template-corner clamping: result tracks the patch centre
    out_pos_ref[i, 0] = fx_ + (px - (tx + r))
    out_pos_ref[i, 1] = fy_ + (py - (ty + r))
    out_err_ref[i, 0] = err


def klt_track_level_pallas(
    img_prev: jnp.ndarray,
    img_next: jnp.ndarray,
    positions: jnp.ndarray,  # [N, 2] (x, y) at this level's scale
    guesses: jnp.ndarray,  # [N, 2]
    win: int = 21,
    iters: int = 8,
    interpret: bool = False,
):
    """Track all N features one pyramid level. Returns (positions [N,2], err [N])."""
    N = positions.shape[0]
    out_pos, out_err = pl.pallas_call(
        functools.partial(_klt_kernel, win=win, iters=iters),
        grid=(N,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, 2), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
        ),
        interpret=interpret,
    )(
        positions.astype(jnp.float32),
        guesses.astype(jnp.float32),
        img_prev.astype(jnp.float32),
        img_next.astype(jnp.float32),
    )
    return out_pos, out_err[:, 0]
