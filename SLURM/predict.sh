#!/bin/bash
# Landscape prediction sweep (equivalent of reference SLURM/predict.sh,
# including the whole-run profile). Shard the tile list across array tasks:
# each task processes tiles where (tile_index % ARRAY_SIZE) == ARRAY_ID —
# the per-tile outputs are idempotent files so overlapping work is safe.
#SBATCH --job-name=dta_tpu_predict
#SBATCH --cpus-per-task=16
#SBATCH --mem=128GB
#SBATCH --time=48:00:00
#SBATCH --output=logs/predict_%j.out
#SBATCH --error=logs/predict_%j.err

set -euo pipefail
# Multi-host fan-out: `srun --ntasks=<hosts> bash SLURM/predict.sh` — each
# process takes a stride of the tile list on a mesh of its own devices
# (predict.py partitions via jax.process_index; outputs are idempotent files).
python -m cProfile -o "logs/predict_${SLURM_JOB_ID:-local}_${SLURM_PROCID:-0}.pstats" predict.py
