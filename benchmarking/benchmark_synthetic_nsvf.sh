#!/bin/bash
# Synthetic-NSVF suite (reference benchmarking/benchmark_synthetic_nsvf.sh)
set -e
export ROOT_DIR=${ROOT_DIR:-/datasets/Synthetic_NSVF}

for SCENE in Wineholder Steamtrain Toad Robot Bike Palace Spaceship \
             Lifestyle; do
    python -m ingp_tpu.train \
        --root_dir "$ROOT_DIR/$SCENE" --dataset_name nsvf \
        --exp_name "$SCENE" --no_save_test \
        --num_epochs 20 --normal_epochs 0 --batch_size 16384 --lr 2e-2
done
