#!/usr/bin/env bash
# Full-schedule end-to-end quality soak on the production-scale synthetic
# scene (360x640, 10 views, 50-frame loop): stage-1 140 epochs -> cull ->
# stage-2 full 6x50 pyramid -> holdout-view evaluation -> eval_metrics.txt.
# Runs on the real TPU chip; logs timestamps to soak/soak.log.
set -uo pipefail
cd "$(dirname "$0")/.."

log() { echo "[$(date +%H:%M:%S)] $*"; }

if [ ! -d data/soak ]; then
  log "generating synthetic scene (10 views, 360x640, 50 frames)..."
  python - <<'EOF'
from videoloop3d_tpu.data import synthetic
scene = synthetic.make_scene(n_views=10, h=360, w=640, n_frames=50, seed=0)
synthetic.write_llff_dir(scene, "data/soak", factor=1)
print("scene written")
EOF
fi

log "=== stage 1 (140 epochs) ==="
python -m videoloop3d_tpu.tools.train_3d \
  --config configs/mpi_base.txt --config1 configs/soak_synthetic_s1.txt \
  || { log "STAGE1 FAILED rc=$?"; exit 1; }

log "=== stage 2 (6 levels x 50 epochs) ==="
python -m videoloop3d_tpu.tools.train_3dvid \
  --config configs/mpv_base.txt --config1 configs/soak_synthetic_s2.txt \
  || { log "STAGE2 FAILED rc=$?"; exit 1; }

log "=== render (holdout view, full loop) ==="
python -m videoloop3d_tpu.tools.render_video \
  --config configs/mpv_base.txt --config1 configs/soak_synthetic_s2.txt \
  --v 9 --t 0:50 || log "RENDER FAILED rc=$? (continuing)"

log "=== evaluate (holdout view) ==="
python -m videoloop3d_tpu.tools.evaluate \
  --config configs/mpv_base.txt --config1 configs/soak_synthetic_s2.txt \
  || { log "TPU eval failed (rc=$?) - retrying on CPU (--gpu_num 0)";
       python -m videoloop3d_tpu.tools.evaluate \
         --config configs/mpv_base.txt \
         --config1 configs/soak_synthetic_s2.txt --gpu_num 0 \
         || { log "EVAL FAILED rc=$?"; exit 1; }; }

log "DONE"
