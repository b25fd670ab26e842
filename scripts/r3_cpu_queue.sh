#!/bin/bash
# CPU f64 (dense covariance) cross-check runs of the full-length proxies.
# Runs concurrently with the TPU queue: CPU-only processes (axon pool var
# cleared) never touch the tunnel.
cd /root/repo
export PYTHONPATH=/root/repo
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

while [ ! -f /tmp/eqvio_proxies/v101/proxy_info.yaml ]; do sleep 5; done
echo "[cpu-queue] === v101 proxy CPU f64 ==="
timeout 3300 python -m eqvio_tpu.app.batch configs/proxy_v101_only.yaml \
    configs/config_v101_proxy.yaml --output results/proxy_cpu_f64 \
    --checkpointEvery 400 --noPlots > /tmp/cpu_v101.log 2>&1
echo "[cpu-queue] v101 exit=$?"

while [ ! -f /tmp/eqvio_proxies/racing/proxy_info.yaml ]; do sleep 5; done
echo "[cpu-queue] === racing proxy CPU f64 ==="
timeout 3300 python -m eqvio_tpu.app.batch configs/proxy_racing_only.yaml \
    configs/config_racing_proxy.yaml --output results/proxy_cpu_f64 \
    --checkpointEvery 400 --noPlots > /tmp/cpu_racing.log 2>&1
echo "[cpu-queue] racing exit=$?"
echo "[cpu-queue] ALL DONE"
