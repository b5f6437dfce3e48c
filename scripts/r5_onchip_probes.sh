#!/bin/bash
# Round-5 on-chip measurement sequence (run when the chip is otherwise
# idle; each step appends to /tmp/r5_probes/). Order: cheapest and most
# decision-relevant first.
set -u
OUT=${1:-/tmp/r5_probes}
mkdir -p "$OUT"
export PYTHONPATH=/root/.axon_site:/root/repo

echo "== probe_deformable (kernel v2 + block sweep) =="
timeout 2400 python scripts/probe_deformable.py \
  2>&1 | tee "$OUT/probe_deformable.log"

echo "== gdino bench section =="
SOLA_BENCH_ONLY=gdino timeout 2400 python bench.py \
  2>&1 | tee "$OUT/bench_gdino.log"

echo "== train variants (kernel dropout / rbg / bf16) =="
timeout 2400 python scripts/bench_train_variants.py \
  2>&1 | tee "$OUT/train_variants.log"

echo "== profile_gdino stage ablation (bf16) =="
timeout 2400 python scripts/profile_gdino.py --bf16 \
  2>&1 | tee "$OUT/profile_gdino.log"
echo "ALL PROBES DONE"
