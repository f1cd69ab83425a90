#!/usr/bin/env bash
# Multi-host TPU pod launcher (replaces the reference's torch.distributed.launch
# docker/SLURM wrappers: docker/run_train.sh:3-11, slurm_train_2gpu.slurm:10-16).
#
# On a TPU pod slice every worker runs the SAME command; JAX discovers the
# topology from the TPU runtime (no MASTER_ADDR/WORLD_SIZE plumbing). This
# script: (1) syncs the repo to all workers, (2) fans the training command out
# with --worker=all, (3) runs it under nohup so SSH drops don't kill training,
# and (4) enables run.auto_resume=true so a preempted/restarted launch
# continues from the newest checkpoint (the reference's recovery was
# re-launching by hand with run.resume=..., SURVEY.md §5.3).
#
# Usage:
#   TPU_NAME=my-pod ZONE=us-central2-b ./scripts/launch_tpu_pod.sh \
#       configs/r50_baseline.yaml [key=value overrides...]
#   TPU_NAME=my-pod ZONE=... ./scripts/launch_tpu_pod.sh --status   # tail logs
#   TPU_NAME=my-pod ZONE=... ./scripts/launch_tpu_pod.sh --stop     # kill run
#
# Local single-host fallback (no TPU_NAME): runs train.py directly.
set -euo pipefail

CONFIG=${1:-configs/r50_baseline.yaml}
shift || true

if [[ -z "${TPU_NAME:-}" ]]; then
    # single host (1 process, all local chips) — auto_resume still applies
    exec python train.py -c "$CONFIG" run.auto_resume=true "$@"
fi

ZONE=${ZONE:?set ZONE (e.g. us-central2-b)}
REMOTE_DIR=${REMOTE_DIR:-'~/sota_imagenet_tpu'}
SSH=(gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all --command)

if [[ "$CONFIG" == "--status" ]]; then
    "${SSH[@]}" "tail -n 5 $REMOTE_DIR/train.out"
    exit 0
fi
if [[ "$CONFIG" == "--stop" ]]; then
    # kill by the recorded pid (process-group kill: setsid made it a leader),
    # not by pattern — pattern kills can match unrelated processes. The pid
    # file is removed afterwards so the next sync's live-run guard can't
    # match a recycled PID.
    "${SSH[@]}" "{ [[ -f $REMOTE_DIR/train.pid ]] && kill -- -\$(cat $REMOTE_DIR/train.pid); rm -f $REMOTE_DIR/train.pid; } || true"
    exit 0
fi

REPO_ROOT=$(cd "$(dirname "$0")/.." && pwd)

echo ">> syncing $REPO_ROOT to all workers of $TPU_NAME"
# scp supports --worker=all; exclude run artifacts
TMP_TAR=$(mktemp /tmp/sota_tpu_XXXX.tar.gz)
tar -C "$REPO_ROOT" --exclude logs --exclude .git --exclude '__pycache__' -czf "$TMP_TAR" .
gcloud compute tpus tpu-vm scp "$TMP_TAR" "$TPU_NAME":/tmp/sota_tpu.tar.gz --zone "$ZONE" --worker=all
# extract into a FRESH tree and swap: extracting over the old tree would keep
# deleted/renamed files around (stale configs silently runnable). Refuse to
# swap under a LIVE run — the next sync's cleanup would delete the tree the
# running trainer is writing checkpoints into; stop it first.
# guard checks the pid is alive AND is actually our trainer (cmdline contains
# train.py) — a recycled PID from a stale train.pid must not block the deploy
"${SSH[@]}" "if [[ -f $REMOTE_DIR/train.pid ]] && kill -0 \$(cat $REMOTE_DIR/train.pid) 2>/dev/null \
      && tr '\0' ' ' < /proc/\$(cat $REMOTE_DIR/train.pid)/cmdline 2>/dev/null | grep -q train.py; then
    echo 'ERROR: a training run is live on this worker — run --stop first'; exit 17
  fi \
  && rm -rf $REMOTE_DIR.new && mkdir -p $REMOTE_DIR.new \
  && tar -xzf /tmp/sota_tpu.tar.gz -C $REMOTE_DIR.new \
  && rm -rf $REMOTE_DIR.old \
  && { [[ -d $REMOTE_DIR ]] && mv $REMOTE_DIR $REMOTE_DIR.old || true; } \
  && mv $REMOTE_DIR.new $REMOTE_DIR"
rm -f "$TMP_TAR"

# bootstrap each worker: pinned python deps + the native decode core
# (idempotent — pip no-ops on satisfied pins, make no-ops on a fresh .so).
# SKIP_SETUP=1 skips it for fast re-syncs on already-provisioned pods.
if [[ -z "${SKIP_SETUP:-}" ]]; then
    "${SSH[@]}" "cd $REMOTE_DIR && pip install -q -e . --no-build-isolation && make -s native"
fi

# shell-quote every override so spaces/braces/quotes survive the ONE remote
# shell hop (hydra-style dict overrides like 'optim={_target_: sgd}' would
# re-split otherwise); they arrive as real argv to the worker helper
OVERRIDES=""
for arg in "$@"; do
    OVERRIDES+=" $(printf '%q' "$arg")"
done

echo ">> launching on all workers: $CONFIG$OVERRIDES"
# nohup + setsid: survive the ssh session; one process per host, all local
# chips addressed by JAX; auto_resume makes relaunch-after-preemption a no-op
# decision for the operator (just run this script again). The helper (run AS
# the setsid session leader, then exec'd into python) records its pid/pgid
# in $REMOTE_DIR/train.pid for --stop.
"${SSH[@]}" "cd $REMOTE_DIR && \
  nohup setsid bash scripts/_pod_worker_launch.sh $(printf '%q' "$CONFIG")$OVERRIDES \
  > train.out 2>&1 < /dev/null &"

echo ">> launched. follow with: TPU_NAME=$TPU_NAME ZONE=$ZONE $0 --status"
