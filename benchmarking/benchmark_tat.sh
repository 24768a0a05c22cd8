#!/bin/bash
# TanksAndTemples suite at 0.5x downsample
# (reference benchmarking/benchmark_tat.sh:4-29)
set -e
export ROOT_DIR=${ROOT_DIR:-/datasets/TanksAndTemple}

for SCENE in Ignatius Truck Barn Caterpillar Family; do
    python -m ingp_tpu.train \
        --root_dir "$ROOT_DIR/$SCENE" --dataset_name nsvf \
        --exp_name "$SCENE" --no_save_test --downsample 0.5 \
        --num_epochs 20 --normal_epochs 0 --batch_size 16384
done
