#!/usr/bin/env bash
# Sweep launcher: representation stage over (video x num_points), the analog
# of the reference SLURM sweep (sh_train_representation.sh:16-57). Each run
# is an independent single-chip job; on a pod slice, export
# GSVC_DEVICES="<coords>" per job or use scripts/sh_train_multihost.sh to
# shard GOPs across hosts instead.
#
# Usage: DATA_DIR=/path/to/uvg bash scripts/sh_train_representation.sh
set -euo pipefail

DATA_DIR="${DATA_DIR:?set DATA_DIR to the directory holding the .yuv files}"
OUT_DIR="${OUT_DIR:-result}"
ITERATIONS="${ITERATIONS:-100000}"
IMAGE_LENGTH="${IMAGE_LENGTH:-50}"
WIDTH="${WIDTH:-1920}"
HEIGHT="${HEIGHT:-1080}"
VIDEOS=(${VIDEOS:-Beauty_1920x1080_120fps_420_8bit_YUV.yuv HoneyBee_1920x1080_120fps_420_8bit_YUV.yuv Jockey_1920x1080_120fps_420_8bit_YUV.yuv})
NUM_POINTS=(${NUM_POINTS:-10000 20000 30000 40000 50000})

for video in "${VIDEOS[@]}"; do
  name="$(basename "$video" .yuv)"
  for np in "${NUM_POINTS[@]}"; do
    echo ">>> representation: $name num_points=$np"
    python train_video_Represent.py \
      --dataset "$DATA_DIR/$video" \
      --data_name "$name" \
      --width "$WIDTH" --height "$HEIGHT" \
      --num_points "$np" \
      --iterations "$ITERATIONS" \
      --image_length "$IMAGE_LENGTH" \
      --savdir "$OUT_DIR" \
      --is_rm --is_ad
  done
done
