#!/bin/bash
# SLURM launcher equivalent of reference scripts/evaluate.sh
#SBATCH --job-name=waves-eval
#SBATCH --nodes=1
#SBATCH --ntasks=1
#SBATCH --time=12:00:00
set -e
cd "$(dirname "$0")/../.."
python scripts_tpu/mpc.py --data "${DATA_OUT:-data/run1}" \
    --checkpoint "${CHECKPOINT:?set CHECKPOINT=models/.../checkpoint_step=N}"
