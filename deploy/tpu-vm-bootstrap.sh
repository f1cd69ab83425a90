#!/usr/bin/env bash
# TPU-VM image bootstrap — the pod-era analog of the reference's container
# recipe (reference docker/Dockerfile:1-34). Run ONCE per worker on a fresh
# `tpu-ubuntu2204-base` TPU VM (directly, via --metadata startup-script, or
# through `launch_tpu_pod.sh` with BOOTSTRAP=1); afterwards the launcher's
# per-sync `make setup` is a fast no-op on the satisfied pins.
#
# Captures the EXACT environment the benchmarks ran with (PERF.md):
#   - python deps pinned by pyproject.toml (jax/flax/optax/orbax set)
#   - jax[tpu] + the matching libtpu wheel
#   - system libjpeg-turbo headers + toolchain for native/libimgpipe.so
#
# Usage:  bash deploy/tpu-vm-bootstrap.sh [/path/to/repo]
set -euo pipefail

REPO=${1:-"$(cd "$(dirname "$0")/.." && pwd)"}

echo ">> system packages (libjpeg for the native decode core)"
export DEBIAN_FRONTEND=noninteractive
sudo apt-get update -qq
sudo apt-get install -y -qq build-essential libjpeg-turbo8-dev python3-venv

echo ">> python environment"
# dedicated venv so system-python upgrades never shift the pins
VENV=${VENV:-"$HOME/.venvs/sota_tpu"}
python3 -m venv "$VENV" 2>/dev/null || true
# shellcheck disable=SC1091
source "$VENV/bin/activate"
pip install -q --upgrade pip

echo ">> pinned framework deps + TPU runtime"
# pyproject pins the jax version; the libtpu wheel must match it
pip install -q -e "$REPO" --no-build-isolation
pip install -q "jax[tpu]==0.9.0" \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

echo ">> native decode core"
make -s -C "$REPO/native"

echo ">> smoke"
python - <<'EOF'
import jax
print("jax", jax.__version__, "| devices:", jax.device_count(), jax.devices()[0].platform)
import sota_imagenet_tpu  # noqa: F401  (import works from anywhere once installed)
EOF

echo ">> done. Activate with: source $VENV/bin/activate ; train with: sota-train -c <config>"
