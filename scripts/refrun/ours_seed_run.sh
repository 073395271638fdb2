#!/bin/bash
# One ours-side h2h run at a given seed (ROADMAP item 7b seed band).
#   scripts/refrun/ours_seed_run.sh <seed> [scene_suffix] [extra flags...]
# Trains stage 1 + stage 2 with the matched h2h schedule, dumps the
# stage-1 static renders and the stage-2 loops for scoring.
# scene_suffix selects the config pair (default "" = scene 1;
# "_sc2" = the rich scene 2 configs).
set -e
SEED=${1:?seed}
SFX=${2:-}
shift || true; shift || true
cd /root/repo
CFG=scripts/refrun/configs
S1=h2h_s1${SFX}_seed${SEED}
S2=h2h_s2${SFX}_seed${SEED}

echo "[ours-seed${SEED}${SFX}] s1 start $(date +%T)"
python -m videoloop3d_tpu.tools.train_3d --config $CFG/ours_s1${SFX}.txt \
    --seed $SEED --expname $S1 "$@"
python scripts/refrun/dump_ours_s1.py --config $CFG/ours_s1${SFX}.txt \
    --expname $S1 --views 0,1,2,3,4,5,6,7,8,9 \
    --out /tmp/refrun/pred_ours_s1${SFX}_seed${SEED}
echo "[ours-seed${SEED}${SFX}] s2 start $(date +%T)"
python -m videoloop3d_tpu.tools.train_3dvid --config $CFG/ours_s2${SFX}.txt \
    --seed $SEED --expname $S2 \
    --init_from mpis_ours/$S1/ckpt_epoch_0098.npz "$@"
python scripts/refrun/dump_ours.py --config $CFG/ours_s2${SFX}.txt \
    --expname $S2 --views 0,1,2,3,4,5,6,7,8,9 \
    --out /tmp/refrun/pred_ours${SFX}_seed${SEED}
echo "[ours-seed${SEED}${SFX}] done $(date +%T)"
