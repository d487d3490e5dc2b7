#!/bin/bash
# Demo on the tiny in-repo Cityscapes clip (reference scripts/cityscapes/demo.sh).
# Points at the reference demo data when present; override with --data.dataroot.
LVD_TAG=${1:-demo_lvd}
FLP_TAG=${2:-demo_flp}
WIF_TAG=${3:-demo_wif}
DEMO_ROOT=${DEMO_ROOT:-/root/reference/datasets/demo_cityscapes}

bash "$(dirname "$0")/test_mat.sh" "$LVD_TAG" "$FLP_TAG" "$WIF_TAG" \
 --name demo_cityscapes \
 --data.dataroot "$DEMO_ROOT" \
 "${@:4}"
