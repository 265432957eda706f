#!/bin/bash
# Follow-up TPU queue: BERT-large engine (after the jit-arg fix for the
# remote-compile 413), learn-ranges profile, and export round-trip check.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jaxcache
mkdir -p /tmp/tpu_q2
echo "== bench.py --large ==" | tee /tmp/tpu_q2/status
timeout 3600 python -u bench.py --large --batch 64 \
  > /tmp/tpu_q2/bench_large.log 2>&1
echo "bench_large rc=$?" | tee -a /tmp/tpu_q2/status
echo "== qat_profile (learn-ranges attribution) ==" | tee -a /tmp/tpu_q2/status
timeout 3000 python -u scripts/qat_profile.py \
  > /tmp/tpu_q2/qat_profile.log 2>&1
echo "qat_profile rc=$?" | tee -a /tmp/tpu_q2/status
echo "== export round-trip on device ==" | tee -a /tmp/tpu_q2/status
timeout 1800 python -u scripts/tpu_export_check.py \
  > /tmp/tpu_q2/export_check.log 2>&1
echo "export_check rc=$?" | tee -a /tmp/tpu_q2/status
echo done | tee -a /tmp/tpu_q2/status
