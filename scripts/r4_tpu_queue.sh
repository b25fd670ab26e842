#!/bin/bash
# Round-4 serialized TPU queue: ONE TPU python at a time (the tunnel
# serializes TPU processes; CLAUDE.md).  Steps write sentinel files under
# /tmp/r4_done/ so follow-up queues wait on explicit completion markers
# instead of counting log lines (ADVICE r3 medium #1).
#
# Order = judge priority (VERDICT r3): production-mode (f32+sqrt) proxy
# accuracy with the round-4 two-QR filter -> TPU f64 cross-check runs
# (separates precision loss from path differences) -> bench warm-up for the
# driver's end-of-round run.
cd /root/repo
# NB: do NOT overwrite PYTHONPATH — the baked /root/.axon_site entry is what
# registers the axon TPU backend.
export PYTHONPATH=/root/repo:${PYTHONPATH}
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
mkdir -p /tmp/r4_done

step () { # step <name> <timeout_s> <cmd...>
    local name=$1 to=$2; shift 2
    echo "[r4-queue] === $name ==="
    timeout "$to" "$@" > "/tmp/r4_${name}.log" 2>&1
    local rc=$?
    echo "[r4-queue] $name exit=$rc"
    echo "$rc" > "/tmp/r4_done/$name"
}

while [ ! -f /tmp/eqvio_proxies/racing/proxy_info.yaml ]; do sleep 5; done
while [ ! -f /tmp/eqvio_proxies/v101/proxy_info.yaml ]; do sleep 5; done

step racing_f32 5400 python -m eqvio_tpu.app.batch configs/proxy_racing_only.yaml \
    configs/config_racing_proxy.yaml --output results/proxy_tpu_f32 --noPlots
step v101_f32 5400 python -m eqvio_tpu.app.batch configs/proxy_v101_only.yaml \
    configs/config_v101_proxy.yaml --output results/proxy_tpu_f32 --noPlots
step racing_f64 5400 python scripts/run_proxy.py racing --dtype f64 --sqrt \
    --out results/proxy_tpu_f64/racing_proxy
step v101_f64 5400 python scripts/run_proxy.py v101 --dtype f64 --sqrt \
    --out results/proxy_tpu_f64/v101_proxy
step bench 3600 python bench.py
echo "[r4-queue] ALL DONE"
