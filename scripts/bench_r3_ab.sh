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

# NN-metric probe at full eval scale ON THE CHIP: the decomposed
# (per-frame extraction) program family may sidestep the old
# patcht=7/stridet=1 worker crash entirely
echo "=== F_nnmse_tpu ($(date +%H:%M:%S)) ===" >> "$LOG"
timeout 900 python - >> "$LOG" 2>&1 <<'EOF' || echo "FAILED rc=$?" >> "$LOG"
import time
import numpy as np
from videoloop3d_tpu.eval import nnmse as NN
rng = np.random.default_rng(0)
src = rng.random((3, 50, 280, 560), dtype=np.float32)
tar = rng.random((3, 50, 280, 560), dtype=np.float32)
for p, s, pt, st in ((5, 2, 7, 1), (11, 4, 5, 1), (17, 6, 3, 1)):
    t0 = time.time()
    f, b = NN.compute_nnerr_pair(src, tar, p, s, pt, st)
    print(f"nnmse_pair p{p}s{s}t{pt}st{st}: {time.time()-t0:.1f}s "
          f"f={f:.4f} b={b:.4f}", flush=True)
EOF
echo "DONE $(date +%H:%M:%S)" >> "$LOG"
