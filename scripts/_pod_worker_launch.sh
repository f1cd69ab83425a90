#!/usr/bin/env bash
# Per-worker launch helper, invoked on each pod worker by launch_tpu_pod.sh
# under `setsid` (this shell becomes the session/process-group leader; the
# exec below keeps its pid, so train.pid is both the python pid AND the pgid
# that `--stop` kills with `kill -- -pgid`).
#
# Args: <config> [override ...] — arrive as real argv (the parent quotes
# them for the one remote shell hop), so spaces/braces survive untouched.
set -u
cd "$(dirname "$0")/.."
echo $$ > train.pid
# ALWAYS run the just-synced checkout (a non-editable `sota-train` install
# would silently pin pre-sync code — version skew across the pod); the
# console script is only the fallback for installed-without-checkout hosts
TRAIN="sota-train"
[ -f train.py ] && TRAIN="python train.py"
exec env IMAGENET_DIR="${IMAGENET_DIR:-/data/imagenet}" \
  $TRAIN -c "$1" run.auto_resume=true "${@:2}"
