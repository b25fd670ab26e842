#!/bin/bash
# Follow-up TPU queue: waits for the first queue (v101 -> bench -> racing) to
# finish, then reruns v101 with the tuned sceneDepth and finally reruns the
# updated bench to warm its compile for the driver's end-of-round run.
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH}
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

# Queue 1's final step appends "racing exit=" to /tmp/queue.log; a stale
# aborted queue instance already wrote one such line, so wait for the 2nd.
while [ "$(grep -c 'racing exit=' /tmp/queue.log 2>/dev/null || echo 0)" -lt 2 ]; do sleep 10; done

echo "[queue2] === v101 proxy TPU rerun (tuned sceneDepth) ==="
rm -rf results/proxy_tpu_f32/v101_proxy
timeout 3000 python -m eqvio_tpu.app.batch configs/proxy_v101_only.yaml \
    configs/config_v101_proxy.yaml --output results/proxy_tpu_f32 \
    --checkpointEvery 400 --noPlots > /tmp/tpu_v101b.log 2>&1
echo "[queue2] v101 rerun exit=$?"

echo "[queue2] === bench rerun (updated sceneDepth; warms driver compile) ==="
timeout 3000 python bench.py > /tmp/bench_r3b.log 2>&1
echo "[queue2] bench exit=$?"
echo "[queue2] ALL DONE"
