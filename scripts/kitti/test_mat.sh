#!/bin/bash
# Full pipeline + MAT adversarial inpainting on KITTI (reference
# scripts/kitti/test_mat.sh:46-48 flags).
# Usage: test_mat.sh LVD_TAG FLP_TAG WIF_TAG [--s_inpainter_path ...]
LVD_TAG=$1
FLP_TAG=$2
WIF_TAG=$3

bash "$(dirname "$0")/test.sh" "$LVD_TAG" "$FLP_TAG" "$WIF_TAG" \
 --name test_mat_kitti \
 --s_loop_ii true --s_inpaint_obj true --s_propagate_unique true \
 --s_use_shadows true --s_use_expansion true --s_soft_shadow true \
 --s_propagate_obj true --s_use_inpainter true --s_use_mat_inpainter true \
 --s_inpainter_path checkpoints/mat/mat_places512.npz \
 "${@:4}"
