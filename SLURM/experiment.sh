#!/bin/bash
# Training run on a TPU host (equivalent job envelope to the reference's
# SLURM/experiment.sh: one accelerator, long walltime). On Cloud TPU pods,
# launch this same script on every host; jax.distributed.initialize() in the
# framework picks up the pod topology.
#SBATCH --job-name=dta_tpu_train
#SBATCH --cpus-per-task=8
#SBATCH --mem=64GB
#SBATCH --time=48:00:00
#SBATCH --output=logs/train_%j.out
#SBATCH --error=logs/train_%j.err

set -euo pipefail
BRANCH=$(git rev-parse --abbrev-ref HEAD)
COMMIT=$(git rev-parse HEAD)
# Single host: plain python. Pod: `srun --ntasks=<hosts> bash SLURM/experiment.sh`
# — distributed.initialize() reads SLURM_NTASKS/SLURM_PROCID and jax's SLURM
# cluster detection picks the coordinator; training then runs synchronized
# data-parallel over the global (slice, data) mesh. Pod runs require
# use_data_commit (build the data artifact single-host first).
python train.py "$BRANCH" "$COMMIT"
