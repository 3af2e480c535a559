#!/bin/bash
# SLURM launcher equivalent of reference scripts/train.sh (single TPU host)
#SBATCH --job-name=waves-train
#SBATCH --nodes=1
#SBATCH --ntasks=1
#SBATCH --time=48:00:00
set -e
cd "$(dirname "$0")/../.."
python scripts_tpu/train.py --data "${DATA_OUT:-data/run1}" \
    --model "${MODEL:-acoustic}" --out "models/${MODEL:-acoustic}_run1" \
    --horizon "${HORIZON:-1}" --epochs "${EPOCHS:-10}"
