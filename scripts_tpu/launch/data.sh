#!/bin/bash
# SLURM launcher equivalent of reference scripts/data.sh (single TPU host)
#SBATCH --job-name=waves-datagen
#SBATCH --nodes=1
#SBATCH --ntasks=1
#SBATCH --time=24:00:00
set -e
cd "$(dirname "$0")/../.."
python scripts_tpu/datagen.py --episodes 500 --out "${DATA_OUT:-data/run1}"
