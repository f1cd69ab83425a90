#!/usr/bin/env bash
# Multi-host TPU pod launch (replaces the reference's torch.distributed.launch
# docker/SLURM wrappers, docker/run_train.sh + slurm_train_*.slurm).
#
# On a TPU pod slice, run the SAME command on every worker; JAX discovers the
# topology from the TPU runtime (no MASTER_ADDR/WORLD_SIZE plumbing needed):
#
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all -- \
#     "cd ~/sota_imagenet_tpu && IMAGENET_DIR=/data/imagenet \
#      python train.py -c configs/r50_baseline.yaml $@"
#
# For CPU-simulated multi-process testing, set JAX_COORDINATOR_ADDRESS (the
# trainer calls jax.distributed.initialize() when it is present).
set -e
CONFIG=${1:-configs/r50_baseline.yaml}
shift || true
exec python train.py -c "$CONFIG" "$@"
