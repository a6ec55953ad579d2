#!/usr/bin/env bash
# Batch driver mirroring the reference's scripts.sh:1-8 —
# full-shot training on VisA, then evaluation across all ten datasets.
set -e

# training
python train.py --save_path ./ckpt/issue --training_mode full_shot

# testing
declare -a dataset=(MVTec BTAD MPDD Brain Liver Retina Colon_clinicDB Colon_colonDB Colon_Kvasir Colon_cvc300)
save_path="./ckpt/issue"
for i in "${dataset[@]}"; do
    python test.py --save_path $save_path --dataset $i
done
