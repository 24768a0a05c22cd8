#!/bin/bash
# BlendedMVS suite (reference benchmarking/benchmark_blendedmvs.sh)
set -e
export ROOT_DIR=${ROOT_DIR:-/datasets/BlendedMVS}

for SCENE in Jade Fountain Character Statues; do
    python -m ingp_tpu.train \
        --root_dir "$ROOT_DIR/$SCENE" --dataset_name nsvf \
        --exp_name "$SCENE" --no_save_test \
        --num_epochs 20 --normal_epochs 0 --batch_size 16384
done
