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
# prefer the installed console script (pyproject.toml); fall back to the
# checkout shim on hosts where `make setup` hasn't run yet
TRAIN="python train.py"
command -v sota-train >/dev/null 2>&1 && TRAIN="sota-train"
exec env IMAGENET_DIR="${IMAGENET_DIR:-/data/imagenet}" \
  $TRAIN -c "$1" run.auto_resume=true "${@:2}"
