#!/bin/bash
# One ours-side h2h run at a given seed (ROADMAP item 7b seed band).
#   scripts/refrun/ours_seed_run.sh <seed> [scene_suffix] [extra flags...]
# Trains stage 1 + stage 2 with the matched h2h schedule, dumps the
# stage-1 static renders and the stage-2 loops for scoring.
# scene_suffix selects the config pair (default "" = scene 1;
# "_sc2" = the rich scene 2 configs).
# Every TPU process goes through tpu_retry.sh: a process launched right
# after the previous one exits can wedge forever on the lingering axon
# claim; the wrapper SIGTERMs and retries after a cool-down.
set -e
SEED=${1:?seed}
SFX=${2:-}
shift || true; shift || true
cd /root/repo
CFG=scripts/refrun/configs
RETRY="scripts/refrun/tpu_retry.sh"
S1=h2h_s1${SFX}_seed${SEED}
S2=h2h_s2${SFX}_seed${SEED}

echo "[ours-seed${SEED}${SFX}] s1 start $(date +%T)"
$RETRY 1500 3 python -m videoloop3d_tpu.tools.train_3d \
    --config $CFG/ours_s1${SFX}.txt --seed $SEED --expname $S1 "$@"
$RETRY 900 3 python scripts/refrun/dump_ours_s1.py \
    --config $CFG/ours_s1${SFX}.txt --expname $S1 \
    --views 0,1,2,3,4,5,6,7,8,9 \
    --out /tmp/refrun/pred_ours_s1${SFX}_seed${SEED}
echo "[ours-seed${SEED}${SFX}] s2 start $(date +%T)"
$RETRY 3000 3 python -m videoloop3d_tpu.tools.train_3dvid \
    --config $CFG/ours_s2${SFX}.txt --seed $SEED --expname $S2 \
    --init_from mpis_ours/$S1/ckpt_epoch_0098.npz "$@"
$RETRY 900 3 python scripts/refrun/dump_ours.py \
    --config $CFG/ours_s2${SFX}.txt --expname $S2 \
    --views 0,1,2,3,4,5,6,7,8,9 \
    --out /tmp/refrun/pred_ours${SFX}_seed${SEED}
echo "[ours-seed${SEED}${SFX}] done $(date +%T)"
