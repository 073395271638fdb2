#!/usr/bin/env bash
# Round-3b full-schedule soak: the shipped configs PLUS the new exact
# fast paths (--compact_tiles --blocked_lookup --fast_nn_dist) —
# launched after the on-chip A/B battery confirms they win.
# Everything timestamped; run with nohup and watch soak_r3b.log.
set -uo pipefail
cd "$(dirname "$0")/.."

log() { echo "[$(date +%H:%M:%S)] $*"; }

NEWFLAGS="--compact_tiles --blocked_lookup --fast_nn_dist"

if [ ! -d data/soak ]; then
  log "generating synthetic scene (10 views, 360x640, 50 frames)..."
  python - <<'EOF'
from videoloop3d_tpu.data import synthetic
scene = synthetic.make_scene(n_views=10, h=360, w=640, n_frames=50, seed=0)
synthetic.write_llff_dir(scene, "data/soak", factor=1)
print("scene written")
EOF
fi

log "=== stage 1 (140 epochs, fresh, shipped flags + new fast paths) ==="
python -u -m videoloop3d_tpu.tools.train_3d \
  --config configs/mpi_base.txt --config1 configs/soak_synthetic_s1.txt \
  --expname soak_r3b $NEWFLAGS \
  || { log "STAGE1 FAILED rc=$?"; exit 1; }

log "=== stage 2 (6 levels x 50 epochs, new fast paths, holdout=4) ==="
python -u -m videoloop3d_tpu.tools.train_3dvid \
  --config configs/mpv_base.txt --config1 configs/soak_synthetic_s2.txt \
  --expname soak_r3b --test_view_idx 4 $NEWFLAGS \
  --init_from mpis/soak_r3b/ckpt_epoch_0119.npz \
  || { log "STAGE2 FAILED rc=$?"; exit 1; }

log "=== render (holdout view 4, full loop) ==="
python -u -m videoloop3d_tpu.tools.render_video \
  --config configs/mpv_base.txt --config1 configs/soak_synthetic_s2.txt \
  --expname soak_r3b --test_view_idx 4 \
  --v 4 --t 0:50 || log "RENDER FAILED rc=$? (continuing)"

log "=== evaluate (all 10 views incl. holdout) ==="
python -u -m videoloop3d_tpu.tools.evaluate \
  --config configs/mpv_base.txt --config1 configs/soak_synthetic_s2.txt \
  --expname soak_r3b --test_view_idx "" \
  || { log "TPU eval failed (rc=$?) - retrying on CPU (--gpu_num 0)";
       python -u -m videoloop3d_tpu.tools.evaluate \
         --config configs/mpv_base.txt \
         --config1 configs/soak_synthetic_s2.txt \
         --expname soak_r3b --test_view_idx "" --gpu_num 0 \
         || { log "EVAL FAILED rc=$?"; exit 1; }; }

log "DONE"
