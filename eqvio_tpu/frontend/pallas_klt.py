"""Pallas TPU kernel for Lucas-Kanade patch tracking.

The KLT inner loop is gather-bound: per feature, per iteration, it needs
bilinear patches from two images at fractional positions.  XLA lowers this
to general gathers; this kernel keeps both pyramid images resident in VMEM
and expresses patch extraction the TPU-idiomatic way:

- **aligned block loads**: a (32, 256) tile at a sublane/lane-aligned corner
  covering the patch neighbourhood (no unaligned dynamic slices, which
  Mosaic rejects on the lane dimension);
- **interpolation as matmul**: bilinear sampling is two 1-D linear
  interpolations, built as tiny selection matrices from ``broadcasted_iota``
  and applied on the MXU — zero gathers anywhere.

Grid: one program per feature.  Images must fit VMEM (true for pyramid
levels of VGA-class video: 752 x 480 x f32 = 1.4 MB).

Falls back to the pure-JAX implementation (``klt.py``) off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:  # public alias when available; the config state otherwise
    from jax.experimental import enable_x64 as _enable_x64
except ImportError:  # pragma: no cover
    from jax._src.config import enable_x64 as _enable_x64

_ROWS = 32  # aligned block rows loaded per feature (>= win + 3, multiple of 8)
_COLS = 256  # aligned block cols (>= 128 + win + 3, multiple of 128)


def _interp_matrices(off_r, off_c, fr, fc, win: int, dtype):
    """Row/col linear-interpolation selection matrices.

    ``R [win, _ROWS]`` with ``R[i, r] = (1-fr)*[r==off_r+i] + fr*[r==off_r+i+1]``
    and ``C [_COLS, win]`` likewise — so ``R @ block @ C`` is the bilinear
    ``win x win`` patch at fractional offset ``(off_r+fr, off_c+fc)``.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (win, _ROWS), 1)
    tgt_r = jax.lax.broadcasted_iota(jnp.int32, (win, _ROWS), 0) + off_r
    R = (rows == tgt_r).astype(dtype) * (1.0 - fr) + (rows == tgt_r + 1).astype(dtype) * fr

    cols = jax.lax.broadcasted_iota(jnp.int32, (_COLS, win), 0)
    tgt_c = jax.lax.broadcasted_iota(jnp.int32, (_COLS, win), 1) + off_c
    C = (cols == tgt_c).astype(dtype) * (1.0 - fc) + (cols == tgt_c + 1).astype(dtype) * fc
    return R, C


def _block_corner(x, y, W: int, H: int):
    """Aligned block corner covering [y-1, y+win+1] x [x-1, x+win+1]."""
    x0 = jnp.floor(x).astype(jnp.int32) - 1
    y0 = jnp.floor(y).astype(jnp.int32) - 1
    xa = jnp.clip((x0 // 128) * 128, 0, W - _COLS)
    ya = jnp.clip((y0 // 8) * 8, 0, H - _ROWS)
    # W/H are multiples of 128/8 (enforced in klt_track_level_pallas), so the
    # clip preserves alignment; the hint lets Mosaic emit aligned vector loads
    return pl.multiple_of(xa, 128), pl.multiple_of(ya, 8)


def _patch(block, xa, ya, x, y, win: int, dtype):
    """Bilinear patch at absolute fractional (x, y) from an aligned block."""
    fx = x - jnp.floor(x)
    fy = y - jnp.floor(y)
    off_c = jnp.floor(x).astype(jnp.int32) - xa
    off_r = jnp.floor(y).astype(jnp.int32) - ya
    R, C = _interp_matrices(off_r, off_c, fy.astype(dtype), fx.astype(dtype), win, dtype)
    return jax.lax.dot_general(
        jax.lax.dot_general(
            R, block, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ),
        C,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _klt_kernel(pos_ref, guess_ref, img_prev_ref, img_next_ref,
                out_pos_ref, out_err_ref, *, win: int, iters: int,
                H: int, W: int):
    """``H, W`` are the PADDED image dims.  The wrapper edge-pads all four
    sides (>= 8 rows / 128 cols) and shifts coordinates into the padded
    frame, so patches that overhang the content sample replicated edge
    values — the same semantics as the JAX path's per-sample coordinate
    clamp in ``_bilinear``.  The clamps below only engage for runaway
    estimates, which the caller's error/in-domain gates drop anyway.

    Traced with x64 OFF: under x64 every Python int/float literal becomes a
    64-bit constant plus a 64->32 convert, and Mosaic cannot lower 64-bit
    converts (its i64->i32 helper recurses until RecursionError).  The
    kernel math is pure f32/i32 either way — the context only keeps the
    literals 32-bit.
    """
    with _enable_x64(False):
        _klt_kernel_body(pos_ref, guess_ref, img_prev_ref, img_next_ref,
                         out_pos_ref, out_err_ref, win=win, iters=iters,
                         H=H, W=W)


def _klt_kernel_body(pos_ref, guess_ref, img_prev_ref, img_next_ref,
                     out_pos_ref, out_err_ref, *, win: int, iters: int,
                     H: int, W: int):
    i = pl.program_id(0)
    dtype = jnp.float32
    r = (win - 1) * 0.5

    px = pos_ref[i, 0]
    py = pos_ref[i, 1]
    # template corner, clamped so the aligned block stays in the padded image
    tx = jnp.clip(px - r, 2.0, W - win - 3.0)
    ty = jnp.clip(py - r, 2.0, H - win - 3.0)
    xa, ya = _block_corner(tx, ty, W, H)
    block_prev = img_prev_ref[pl.ds(ya, _ROWS), pl.ds(xa, _COLS)]

    template = _patch(block_prev, xa, ya, tx, ty, win, dtype)
    gx = _patch(block_prev, xa, ya, tx + 1.0, ty, win, dtype) - _patch(
        block_prev, xa, ya, tx - 1.0, ty, win, dtype
    )
    gy = _patch(block_prev, xa, ya, tx, ty + 1.0, win, dtype) - _patch(
        block_prev, xa, ya, tx, ty - 1.0, win, dtype
    )
    gxx = jnp.sum(gx * gx)
    gxy = jnp.sum(gx * gy)
    gyy = jnp.sum(gy * gy)
    det = gxx * gyy - gxy * gxy
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)

    def body(_, carry):
        cx, cy, _err = carry
        qx = jnp.clip(cx - r, 2.0, W - win - 3.0)
        qy = jnp.clip(cy - r, 2.0, H - win - 3.0)
        xb, yb = _block_corner(qx, qy, W, H)
        block_next = img_next_ref[pl.ds(yb, _ROWS), pl.ds(xb, _COLS)]
        patch = _patch(block_next, xb, yb, qx, qy, win, dtype)
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
        0, iters, body, (gx0, gy0, jnp.asarray(jnp.inf, dtype=dtype))
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
    """Track all N features one pyramid level. Returns (positions [N,2], err [N]).

    Images are edge-padded on ALL FOUR sides (top 8 rows, left 128 cols, and
    bottom/right up to sublane/lane alignment) and coordinates shifted into
    the padded frame: aligned block loads always stay in bounds, and a patch
    overhanging the content samples replicated edge values — matching the
    JAX path's per-sample coordinate clamp exactly for any feature within
    ~one window of the image.
    """
    N = positions.shape[0]
    Hc, Wc = img_prev.shape
    top, left = 8, 128
    bot = (-(Hc + top) % 8) + 8
    rgt = (-(Wc + left) % 128) + 128
    H, W = Hc + top + bot, Wc + left + rgt
    if H < _ROWS:
        bot += _ROWS - H
        H = _ROWS
    if W < _COLS:
        rgt += _COLS - W
        W = _COLS
    pad = ((top, bot), (left, rgt))
    img_prev = jnp.pad(img_prev, pad, mode="edge")
    img_next = jnp.pad(img_next, pad, mode="edge")
    off = jnp.asarray([left, top], jnp.float32)
    positions = positions.astype(jnp.float32) + off
    guesses = guesses.astype(jnp.float32) + off
    # x64 OFF around the pallas_call: with x64 on, the BlockSpec index maps
    # and every Python literal in the kernel trace as 64-bit values, which
    # Mosaic cannot legalize (i64 func.return / recursing i64->i32 convert
    # helper).  All kernel inputs/outputs are f32, so this changes nothing
    # numerically.
    with _enable_x64(False):
        out_pos, out_err = _pallas_klt_call(
            positions, guesses, img_prev, img_next,
            win=win, iters=iters, H=H, W=W, N=N, interpret=interpret,
        )
    return out_pos - off, out_err[:, 0]


def _pallas_klt_call(positions, guesses, img_prev, img_next, *, win, iters,
                     H, W, N, interpret):
    return pl.pallas_call(
        functools.partial(_klt_kernel, win=win, iters=iters, H=H, W=W),
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
