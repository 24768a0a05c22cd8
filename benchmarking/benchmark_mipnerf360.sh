#!/bin/bash
# MipNeRF-360 suite at 0.25x, scale 4-64
# (reference benchmarking/benchmark_mipnerf360.sh:4-48)
set -e
export ROOT_DIR=${ROOT_DIR:-/datasets/360_v2}

run() {  # scene scale
    python -m ingp_tpu.train \
        --root_dir "$ROOT_DIR/$1" --dataset_name colmap \
        --exp_name "$1" --no_save_test --downsample 0.25 \
        --num_epochs 20 --normal_epochs 0 --scale "$2" --batch_size 8192
}

run bicycle 64
run bonsai 16
run counter 16
run garden 16
run kitchen 16
run room 8
run stump 32
run flowers 32
run treehill 64
