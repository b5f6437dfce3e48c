#!/bin/bash
# Warm the persistent JAX compilation cache section by section.
#
# Propagation/encode/AMG/GDINO programs recompile whenever their traced
# structure changes (scan-step gating, fused cond updates, hiera flash
# attention, ...). Through the axon relay a SAM2/GDINO-sized compile takes
# 10-25 min, and the driver's bench runs with per-section budgets that
# assume a WARM cache — so after any program-shape change, run this once
# before the driver does.
#
# Usage: PYTHONPATH=/root/.axon_site:/root/repo bash scripts/warm_cache.sh
# (logs land in /tmp/warm_<section>.log; sections run sequentially --
# NEVER run two TPU jobs at once on this 2-CPU box)

set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp

for section in trackgen e2e packed gdino selection train loader roberta longvideo; do
  echo "=== warming $section ($(date)) ==="
  SOLA_BENCH_ONLY=$section timeout 5400 python bench.py \
    > "/tmp/warm_${section}.log" 2>&1
  rc=$?
  tail -c 300 "/tmp/warm_${section}.log"
  echo "--- $section rc=$rc ---"
done

echo "=== full driver-exact bench ($(date)) ==="
# big total budget so a section that stayed cold (a failed warm pass
# above) can still compile here; the driver's own run uses the default
# 2400 s budget against a fully warm cache
SOLA_BENCH_TOTAL_BUDGET=14400 timeout 15000 python bench.py \
  > /tmp/warm_full.log 2>&1
echo "rc=$?"
tail -c 1500 /tmp/warm_full.log
