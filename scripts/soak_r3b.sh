#!/usr/bin/env bash
# Round-3b full-schedule soak: the shipped configs PLUS the new exact
# fast paths (--compact_tiles --blocked_lookup --fast_nn_dist) —
# launched after the on-chip A/B battery confirms they win.
# Everything timestamped; run with nohup and watch soak_r3b.log.
set -uo pipefail
cd "$(dirname "$0")/.."

log() { echo "[$(date +%H:%M:%S)] $*"; }

# resumable exits (75 = graceful SIGTERM ckpt, 42 = hang watchdog:
# wedged axon claim self-heals in ~3-5 min) retry with auto-resume
retry() {
  local tries=0 rc
  while true; do
    "$@"; rc=$?
    [ "$rc" -eq 0 ] && return 0
    if [ "$rc" -eq 75 ] || [ "$rc" -eq 42 ]; then
      tries=$((tries + 1))
      [ "$tries" -gt 5 ] && { log "giving up after 5 retries"; return "$rc"; }
      log "resumable exit rc=$rc; retry $tries/5 in 240s"
      sleep 240
    else
      return "$rc"
    fi
  done
}

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
retry python -u -m videoloop3d_tpu.tools.train_3d \
  --config configs/mpi_base.txt --config1 configs/soak_synthetic_s1.txt \
  --expname soak_r3b $NEWFLAGS \
  || { log "STAGE1 FAILED rc=$?"; exit 1; }

log "=== stage 2 (6 levels x 50 epochs, new fast paths, holdout=4) ==="
retry python -u -m videoloop3d_tpu.tools.train_3dvid \
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
