#!/bin/bash
# Demo on the tiny in-repo KITTI clip (reference scripts/kitti/demo.sh:3-5,13).
# Points at the reference demo data when present; override with --data.dataroot.
LVD_TAG=${1:-demo_lvd}
FLP_TAG=${2:-demo_flp}
WIF_TAG=${3:-demo_wif}
DEMO_ROOT=${DEMO_ROOT:-/root/reference/datasets/demo_kitti}

bash "$(dirname "$0")/test_mat.sh" "$LVD_TAG" "$FLP_TAG" "$WIF_TAG" \
 --name demo_kitti \
 --data.dataroot "$DEMO_ROOT" \
 "${@:4}"
