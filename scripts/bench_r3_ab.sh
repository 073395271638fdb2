#!/usr/bin/env bash
# Round-3 on-chip A/B battery for the new exact fast paths.  Each run is
# a short foreground bench (the chip is exclusive; one process at a
# time).  Results append to bench_ab.log as labeled JSON lines.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=${1:-bench_ab.log}

run() {
  local label="$1"; shift
  echo "=== $label ($(date +%H:%M:%S)) ===" >> "$LOG"
  timeout 900 python bench.py --no-stage1 "$@" >> "$LOG" 2>&1 \
    || echo "FAILED rc=$?" >> "$LOG"
}

# baseline: shipped flags + the new row-gather window extraction
run "A_shipped_rowgather" --no-compact_tiles
# + tile compaction (bench default)
run "B_plus_compact_tiles"
# + blocked tile-map lookup
run "C_plus_blocked_lookup" --blocked_lookup
# + decomposed NN search
run "D_plus_fast_nn_dist" --blocked_lookup --fast_nn_dist
# decomposition of the best variant
run "E_split_best" --blocked_lookup --fast_nn_dist --split
echo "DONE $(date +%H:%M:%S)" >> "$LOG"
