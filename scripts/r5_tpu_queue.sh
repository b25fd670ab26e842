#!/bin/bash
# Round-5 TPU accuracy queue: regenerate the committed TPU f32+sqrt results
# for all three proxies (the one-QR fusion + Pallas default + power-iteration
# RANSAC changed every program, so all recompile).  Runs from a repo
# snapshot; one TPU python at a time.  Usage:
#   r5_tpu_queue.sh <snapshot_dir> [wait_pid]
REPO=${1:-/tmp/eqvio_tpu_run}
WAIT=${2:-}
if [ -n "$WAIT" ]; then
    while ps -p "$WAIT" >/dev/null 2>&1; do sleep 30; done
fi
cd "$REPO" || exit 1
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

step () {
    local name=$1 to=$2; shift 2
    echo "[r5-tpu] === $name === $(date +%H:%M:%S)"
    timeout "$to" "$@" > "/tmp/r5tpu_${name}.log" 2>&1
    echo "[r5-tpu] $name exit=$? $(date +%H:%M:%S)"
}

step tpu_mh03_f32 5400 python -m eqvio_tpu.app.batch configs/proxy_mh03_only.yaml \
    configs/config_mh03_proxy.yaml --output results/proxy_tpu_f32 --noPlots
step tpu_v101_f32 5400 python -m eqvio_tpu.app.batch configs/proxy_v101_only.yaml \
    configs/config_v101_proxy.yaml --output results/proxy_tpu_f32 --noPlots
step tpu_racing_f32 5400 python -m eqvio_tpu.app.batch configs/proxy_racing_only.yaml \
    configs/config_racing_proxy.yaml --output results/proxy_tpu_f32 --noPlots
echo "[r5-tpu] ALL DONE"
