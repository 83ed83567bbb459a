#!/usr/bin/env bash
# VMAF scoring for reconstructed videos (reference README reports VMAF
# alongside PSNR/MS-SSIM; like the reference, VMAF comes from an external
# host tool, not the training code).
#
# Usage: scripts/compute_vmaf.sh <distorted.(mp4|yuv|rgb)> <reference.(mp4|yuv|rgb)> [W H]
# Raw .yuv inputs are assumed I420; .rgb inputs are raw RGB24 (what
# `python -m gsvc_tpu.decode` writes as decoded.rgb). Pass W H for raws.
set -euo pipefail
if ! command -v ffmpeg >/dev/null 2>&1; then
    echo "ffmpeg (with libvmaf) not found — install it on the eval host." >&2
    exit 2
fi
DIST=$1; REF=$2; W=${3:-1920}; H=${4:-1080}
in_args() {
    case "$1" in
        *.yuv) echo "-f rawvideo -pix_fmt yuv420p -s ${W}x${H} -i $1" ;;
        *.rgb) echo "-f rawvideo -pix_fmt rgb24 -s ${W}x${H} -i $1" ;;
        *) echo "-i $1" ;;
    esac
}
# shellcheck disable=SC2046
ffmpeg -hide_banner $(in_args "$DIST") $(in_args "$REF") \
    -lavfi libvmaf=log_fmt=json:log_path=/dev/stdout -f null - \
    | python3 -c 'import json,sys; d=json.load(sys.stdin); print("VMAF:", d["pooled_metrics"]["vmaf"]["mean"])'
