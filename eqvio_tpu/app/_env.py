"""Runtime numeric configuration shared by the CLI entry points.

TPU f32 matmuls default to bfloat16 accumulation, which is fatal for the
filter's Riccati math, so every entry point pins matmul precision to
float32. Covariance math prefers f64, but TPUs have no native f64 —
enable x64 only where the backend supports it (CPU) and fall back to f32
on TPU, where the float32-precision matmuls keep the filter stable.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def configure_runtime(prefer_x64: bool = True, force_x64: bool = False):
    """Set global precision knobs; returns the preferred state dtype.

    ``force_x64`` (CLI ``--f64``) enables f64 filter math even on TPU —
    slower (no native f64) but bit-comparable to the reference's doubles;
    use it for accuracy validation runs.  The image front end stays f32
    either way.

    ``EQVIO_DEBUG_NANS=1`` turns on jax NaN-checking in every entry point —
    the runtime analogue of the reference's sanitizer builds + pervasive
    ``assert(!hasNaN())`` (SURVEY.md section 5.3).
    """
    jax.config.update("jax_default_matmul_precision", "float32")
    # TPU compiles go through a remote tunnel here and cost 15-30 min per
    # cold program shape; the persistent cache makes warm re-runs ~2 min.
    # An empty env value falls back to the default rather than disabling it.
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") or "/root/.jax_cache"
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception as e:  # pragma: no cover - config key missing in old jax
        import warnings

        warnings.warn(f"persistent compile cache disabled: {e!r}")
    if os.environ.get("EQVIO_DEBUG_NANS"):
        jax.config.update("jax_debug_nans", True)
    # x64 is enabled on EVERY backend so the optional f64-island tria
    # (EQVIO_TRIA=f64; accuracy-validation mode, RESULTS.md) can engage;
    # filter arrays stay f32 on TPU and all hot-path dtypes are pinned
    # (frontend/) so nothing silently promotes.
    jax.config.update("jax_enable_x64", True)
    if force_x64 or (prefer_x64 and jax.default_backend() == "cpu"):
        return jnp.float64
    return jnp.float32
