#!/bin/bash
# Synthetic-NeRF suite: 8 scenes, 20 epochs, bs 16384, lr 2e-2
# (op-point of the reference benchmarking/benchmark_synthetic_nerf.sh)
set -e
export ROOT_DIR=${ROOT_DIR:-/datasets/Synthetic_NeRF}

for SCENE in Chair Drums Ficus Hotdog Lego Materials Mic Ship; do
    python -m ingp_tpu.train \
        --root_dir "$ROOT_DIR/$SCENE" --dataset_name nsvf \
        --exp_name "$SCENE" --no_save_test \
        --num_epochs 20 --normal_epochs 0 --batch_size 16384 --lr 2e-2
done
