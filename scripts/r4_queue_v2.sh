#!/bin/bash
# Round-4 artifact queue v2 (post gate-determinism fix): regenerates every
# committed accuracy artifact with the final code/configs.  Runs from a repo
# snapshot (usage: r4_queue_v2.sh /tmp/r4acc2) so the working repo can keep
# evolving.  ONE TPU python at a time; sentinels in /tmp/r4v2_done/.
REPO=${1:-/tmp/r4acc2}
cd "$REPO" || exit 1
export PYTHONPATH=$REPO:${PYTHONPATH}
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
mkdir -p /tmp/r4v2_done

step () {
    local name=$1 to=$2; shift 2
    echo "[r4v2] === $name === $(date +%H:%M:%S)"
    timeout "$to" "$@" > "/tmp/r4v2_${name}.log" 2>&1
    local rc=$?
    echo "[r4v2] $name exit=$rc $(date +%H:%M:%S)"
    echo "$rc" > "/tmp/r4v2_done/$name"
}

step racing_f32 5400 python -m eqvio_tpu.app.batch configs/proxy_racing_only.yaml \
    configs/config_racing_proxy.yaml --output results/proxy_tpu_f32 --noPlots
step v101_f32 5400 python -m eqvio_tpu.app.batch configs/proxy_v101_only.yaml \
    configs/config_v101_proxy.yaml --output results/proxy_tpu_f32 --noPlots
step racing_f64 5400 python scripts/run_proxy.py racing --dtype f64 --sqrt \
    --out results/proxy_tpu_f64/racing_proxy
step v101_f64 5400 python scripts/run_proxy.py v101 --dtype f64 --sqrt \
    --out results/proxy_tpu_f64/v101_proxy
step bench 3600 python bench.py
echo "[r4v2] ALL DONE"
