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
#
# Resumable exits are retried: 75 = graceful SIGTERM checkpoint
# (preemption), 42 = --hang_timeout watchdog (wedged device claim /
# dead collective peer; the claim self-heals in ~3-5 min, and the
# deterministic auto-resume continues from the checkpoint).
# (scripts/soak_r3b.sh carries the same retry loop - keep them in sync.)
set -euo pipefail
cd "$(dirname "$0")"

STAGE="${STAGE:-1}"
MAX_RETRIES="${MAX_RETRIES:-5}"
ALL_SCENES=$(ls configs/mpis | sed 's/\.txt$//')
SCENES="${SCENES:-$ALL_SCENES}"

run_with_resume() {
  local tries=0 rc
  while true; do
    "$@"
    rc=$?
    if [ "$rc" -eq 0 ]; then
      return 0
    elif [ "$rc" -eq 75 ] || [ "$rc" -eq 42 ]; then
      tries=$((tries + 1))
      if [ "$tries" -gt "$MAX_RETRIES" ]; then
        echo "!!! giving up after $MAX_RETRIES resumable exits (rc=$rc)"
        return "$rc"
      fi
      echo "--- resumable exit rc=$rc; retrying ($tries/$MAX_RETRIES)" \
           "in 240s (past the claim self-heal; auto-resume picks up" \
           "the checkpoint)"
      sleep 240
    else
      echo "!!! failed rc=$rc"
      return "$rc"
    fi
  done
}

for scene in $SCENES; do
  if [ "$STAGE" = "1" ]; then
    echo "=== stage 1: $scene ==="
    run_with_resume python -m videoloop3d_tpu.tools.train_3d \
      --config configs/mpi_base.txt --config1 "configs/mpis/$scene.txt" \
      || exit $?
  else
    echo "=== stage 2: $scene ==="
    run_with_resume python -m videoloop3d_tpu.tools.train_3dvid \
      --config configs/mpv_base.txt --config1 "configs/mpvs/$scene.txt" \
      || exit $?
  fi
done
