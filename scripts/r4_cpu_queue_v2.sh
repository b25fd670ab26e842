#!/bin/bash
# CPU f64 dense reference-parity regeneration (config changed in round 4:
# racing gate disabled).  CPU-only env — safe to run concurrently with the
# TPU queue.  Usage: r4_cpu_queue_v2.sh /tmp/r4acc2
REPO=${1:-/tmp/r4acc2}
cd "$REPO" || exit 1
export PYTHONPATH=$REPO
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
mkdir -p /tmp/r4v2_done

step () {
    local name=$1 to=$2; shift 2
    echo "[r4v2-cpu] === $name === $(date +%H:%M:%S)"
    timeout "$to" "$@" > "/tmp/r4v2_${name}.log" 2>&1
    echo "[r4v2-cpu] $name exit=$? $(date +%H:%M:%S)"
    echo done > "/tmp/r4v2_done/$name"
}

step cpu_racing_f64 3600 python -m eqvio_tpu.app.batch configs/proxy_racing_only.yaml \
    configs/config_racing_proxy.yaml --output results/proxy_cpu_f64 --noPlots
step cpu_v101_f64 3600 python -m eqvio_tpu.app.batch configs/proxy_v101_only.yaml \
    configs/config_v101_proxy.yaml --output results/proxy_cpu_f64 --noPlots
echo "[r4v2-cpu] ALL DONE"
