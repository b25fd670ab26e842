#!/bin/bash
# Test runner: forces CPU-only JAX with an 8-device virtual mesh.
#
# IMPORTANT: PALLAS_AXON_POOL_IPS must be cleared BEFORE the interpreter
# starts — the baked sitecustomize claims the (single) TPU grant at every
# python startup otherwise, serialising all python processes on the TPU
# tunnel and adding minutes of latency per process.
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
exec python -m pytest "${@:-tests/}" -q
