#!/usr/bin/env bash
# Scene fleet launcher — counterpart of the reference's run_all.sh
# (one process per GPU there; here scenes run sequentially per host by
# default, or one-per-host via the SCENES/STAGE env when fanned out
# across TPU workers — multi-scene scale-out stays embarrassingly
# parallel).
#
#   STAGE=1 ./run_all.sh            # all stage-1 runs
#   STAGE=2 ./run_all.sh            # all stage-2 runs
#   SCENES="108fall2 usttap" STAGE=1 ./run_all.sh
set -euo pipefail

STAGE="${STAGE:-1}"
ALL_SCENES=$(ls configs/mpis | sed 's/\.txt$//')
SCENES="${SCENES:-$ALL_SCENES}"

for scene in $SCENES; do
  if [ "$STAGE" = "1" ]; then
    echo "=== stage 1: $scene ==="
    python -m videoloop3d_tpu.tools.train_3d \
      --config configs/mpi_base.txt --config1 "configs/mpis/$scene.txt"
  else
    echo "=== stage 2: $scene ==="
    python -m videoloop3d_tpu.tools.train_3dvid \
      --config configs/mpv_base.txt --config1 "configs/mpvs/$scene.txt"
  fi
done
