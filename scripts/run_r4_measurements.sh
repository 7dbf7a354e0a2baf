#!/bin/bash
# Round-4 measurement batch (the flagship + batched-grid runs are
# captured separately by out/r4/flagship_final.sh). TPU steps are single
# processes that exit cleanly — a killed TPU process wedges the chip
# grant for ~10 min.
cd "$(dirname "$0")/.."
mkdir -p out/r4
LOG=out/r4/batch.log
step() { echo "=== $1 ($(date +%T)) ===" | tee -a "$LOG"; }

step "bench.py headline (TPU + CPU probe)"
python bench.py > out/r4/bench_headline.json 2> out/r4/bench_headline.err

step "scale sweep TPU (S/XL/XXL PCG + window strategies + phong + photometric)"
python scripts/bench_xl.py > out/r4/bench_xl_tpu.jsonl 2> out/r4/bench_xl_tpu.err

step "scale sweep CPU"
JAX_PLATFORMS=cpu python scripts/bench_xl.py \
  > out/r4/bench_xl_cpu.jsonl 2> out/r4/bench_xl_cpu.err

step "ba_all_sims full ATE table (CPU f64, reference configuration)"
JAX_PLATFORMS=cpu DATA_DIR=out/sims bash scripts/ba_all_sims.sh \
  > out/r4/ba_all_sims.log 2>&1

step "done"
