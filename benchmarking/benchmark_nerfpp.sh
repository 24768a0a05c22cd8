#!/bin/bash
# NeRF++ T&T + LF scenes, scale 4-16 (reference
# benchmarking/benchmark_nerfpp.sh:5-50)
set -e
export ROOT_DIR=${ROOT_DIR:-/datasets/nerfpp}

run() {  # scene scale batch
    python -m ingp_tpu.train \
        --root_dir "$ROOT_DIR/$1" --dataset_name nerfpp \
        --exp_name "$1" --no_save_test --use_skybox \
        --num_epochs 20 --normal_epochs 0 --scale "$2" --batch_size "$3"
}

run tat_intermediate_M60 4 8192
run tat_intermediate_Playground 8 8192
run tat_intermediate_Train 16 4096
run tat_training_Truck 8 8192
run lf_africa 4 8192
run lf_basket 4 8192
run lf_ship 8 8192
run lf_statue 4 8192
run lf_torch 8 8192
