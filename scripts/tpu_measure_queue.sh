#!/bin/bash
# One-shot TPU measurement queue for after a tunnel outage: runs the
# pending benches sequentially (the tunnel serializes; never parallel).
#   bash scripts/tpu_measure_queue.sh
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jaxcache
mkdir -p /tmp/tpu_q
echo "== probe ==" | tee /tmp/tpu_q/status
timeout 120 python -c "import jax; print(jax.devices())" || {
  echo "tunnel still down" | tee -a /tmp/tpu_q/status; exit 1; }
echo "== bench.py --full (engine regression check) ==" | tee -a /tmp/tpu_q/status
timeout 3600 python -u bench.py --full > /tmp/tpu_q/bench_full.log 2>&1
echo "bench rc=$?" | tee -a /tmp/tpu_q/status
echo "== qat_bench (packed ranges + amp variants) ==" | tee -a /tmp/tpu_q/status
timeout 3600 python -u scripts/qat_bench.py --batch 32 \
  > /tmp/tpu_q/qat_bench.log 2>&1
echo "qat_bench rc=$?" | tee -a /tmp/tpu_q/status
echo "== bench.py --large (BERT-large int8 engine) ==" | tee -a /tmp/tpu_q/status
timeout 3600 python -u bench.py --large --batch 64 \
  > /tmp/tpu_q/bench_large.log 2>&1
echo "bench_large rc=$?" | tee -a /tmp/tpu_q/status
echo done | tee -a /tmp/tpu_q/status
