#!/bin/bash
# Run a TPU-touching command with wedge-proof retries.
#
# Back-to-back TPU processes can hang FOREVER at their first device op
# when the previous process's axon claim lingers (observed twice in the
# round-5 h2h campaign: a dump launched right after a trainer exits
# futex-waits indefinitely — it does not recover when the claim
# self-heals).  Pattern: bounded attempt, SIGTERM on timeout, cool-down
# (past the 3-5 min claim self-heal), retry.
#   scripts/refrun/tpu_retry.sh <timeout_s> <max_tries> cmd args...
set -u
TO=${1:?timeout}; TRIES=${2:?tries}; shift 2
for i in $(seq 1 "$TRIES"); do
  timeout --signal=TERM --kill-after=30 "$TO" "$@" && exit 0
  rc=$?
  echo "[tpu_retry] attempt $i/$TRIES rc=$rc; cooling down 240s" >&2
  sleep 240
done
echo "[tpu_retry] FAILED after $TRIES attempts: $*" >&2
exit 1
