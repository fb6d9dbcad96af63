#!/bin/bash
# First actions the moment the axon tunnel answers (VERDICT r3 task 1).
# Run unattended:  bash scripts/tpu_first_actions.sh &> /tmp/tpu_first.log
#
# 1. 60 s device probe (abort early if still dark)
# 2. python bench.py        -> canonical one-line JSON (incl. Speck e2e)
# 3. scripts/tpu_revalidate.py  -> hardware proofs for the round-4
#    kernel batch (blocked matmuls, frontier nb, banded DMA sweep,
#    fused response)
# Results land in /tmp/bench_r4.json and /tmp/revalidate_r4.jsonl.
set -u
cd "$(dirname "$0")/.."

echo "== probe $(date -u +%H:%M:%S)"
if ! timeout 60 python -c "import jax; print(jax.devices())"; then
    echo "tunnel still dark — aborting"
    exit 1
fi

echo "== bench $(date -u +%H:%M:%S)"
timeout 3600 python bench.py | tee /tmp/bench_r4.json

echo "== revalidate $(date -u +%H:%M:%S)"
timeout 3000 python scripts/tpu_revalidate.py | tee /tmp/revalidate_r4.jsonl

echo "== done $(date -u +%H:%M:%S)"
