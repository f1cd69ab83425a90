#!/usr/bin/env bash
# Real-TPU soak + crash-recovery drive (configs/tpu_soak.yaml).
#
# Phase 1: train until ~mid-run, then SIGKILL the process (simulated
#          preemption — the reference's recovery story is relaunch-by-hand
#          with run.resume, SURVEY.md §5.3; ours is run.auto_resume).
# Phase 2: relaunch with run.auto_resume=true; it must pick up the newest
#          checkpoint in the SAME run dir tree and finish all stages,
#          crossing the progressive-resize boundary.
#
# Usage: scripts/tpu_soak.sh [grace_seconds_after_first_ckpt] [override ...]
#   e.g. scripts/tpu_soak.sh 20 loader.device_cache=true
set -u
cd "$(dirname "$0")/.."
GRACE=${1:-20}
shift $(( $# > 0 ? 1 : 0 ))
LOGDIR=logs/soak_$(date +%H%M%S)

echo "== phase 1: train, kill -9 ${GRACE}s after the first checkpoint lands =="
python train.py -c configs/tpu_soak.yaml log.dir="$LOGDIR" "$@" > /tmp/soak_p1.log 2>&1 &
PID=$!
# wait (up to 15 min: first remote TPU compile can queue) for a checkpoint,
# so the kill tests resume-from-checkpoint, not train-from-scratch
for _ in $(seq 1 180); do
  compgen -G "$LOGDIR/*/*/model*.ckpt" > /dev/null && break
  kill -0 "$PID" 2>/dev/null || break
  sleep 5
done
sleep "$GRACE"
kill -9 "$PID" 2>/dev/null
wait "$PID" 2>/dev/null
echo "killed pid $PID; last lines:"
tail -5 /tmp/soak_p1.log

if ! compgen -G "$LOGDIR/*/*/model*.ckpt" > /dev/null; then
  echo "SOAK FAILED: phase 1 never produced a checkpoint (nothing to resume)"
  exit 1
fi

echo "== phase 2: auto_resume =="
python train.py -c configs/tpu_soak.yaml log.dir="$LOGDIR" run.auto_resume=true "$@" > /tmp/soak_p2.log 2>&1
RC=$?
tail -15 /tmp/soak_p2.log
echo "exit code: $RC"
# OK requires BOTH: the resume actually loaded a checkpoint AND the resumed
# run completed — completion alone would pass a from-scratch phase 2
if grep -q "Loaded checkpoint" /tmp/soak_p2.log && grep -q "Total time" /tmp/soak_p2.log; then
  echo "SOAK OK: resumed from checkpoint and completed"
else
  echo "SOAK FAILED"
  exit 1
fi
