#!/bin/bash
# Full-pipeline end-to-end demo on the synthetic dataset: trains the three
# modules (LVD -> FLP -> WIF) for a few hundred iterations each, then runs
# vid_prediction and the offline metrics — everything offline, one chip.
# Usage: synthetic_e2e.sh [ITERS] [SAVE_PATH]
set -e
ITERS=${1:-200}
ROOT=${2:-/tmp/waldo_synth_e2e}
COMMON="--dataset synthetic --dim 64 --aspect_ratio 2.0 --true_dim 64 \
 --data.num_lyt 8 --data.fg_idx 1,4,5 --data.bg_idx 0,3 --data.other_idx 2 \
 --data.vid_len 6 --data.num_workers 4 --save_path $ROOT \
 --s_patch_size 8 --s_latent_shape 8,16 --s_obj_shape 4,4 --s_embed_dim 128 \
 --s_num_heads 8 --s_num_obj 8 --s_oe_depth 2 --s_pe_depth 2 \
 --s_oe_num_timesteps 6 --s_pg_num_timesteps 6 --s_pg_com_depth 1 \
 --s_pg_enc_depth 2 --s_pg_dec_depth 2 --s_ii_depth 3 --s_ii_embed_dim 64 \
 --s_ctx_len 3 --s_min_ctx_length_vid 3 --s_max_ctx_length_vid 3 \
 --s_edge_size 7 --num_iter $ITERS --save_latest_freq 100 --log_freq 50 \
 --batch_size_vid 8"

echo "=== stage 1: LVD ==="
python -m waldo_tpu.cli.train --name e2e_lvd $COMMON \
 --vid_modes vid_object_extractor
LVD=$(ls -t $ROOT/checkpoints | grep e2e_lvd | head -1)

echo "=== stage 2: FLP (frozen LVD: $LVD) ==="
python -m waldo_tpu.cli.train --name e2e_flp $COMMON \
 --vid_modes vid_pose_generator --s_use_pg true \
 --s_load_path "$ROOT/checkpoints/$LVD"
FLP=$(ls -t $ROOT/checkpoints | grep e2e_flp | head -1)

echo "=== stage 3: WIF (frozen LVD) ==="
python -m waldo_tpu.cli.train --name e2e_wif $COMMON \
 --vid_modes vid_inpainting --s_use_ii true \
 --s_vid_inpainting_losses sharp_vid \
 --s_load_path "$ROOT/checkpoints/$LVD"
WIF=$(ls -t $ROOT/checkpoints | grep e2e_wif | head -1)

echo "=== inference: vid_prediction ==="
python -m waldo_tpu.cli.test --name e2e_test $COMMON \
 --vid_modes vid_prediction --s_use_pg true --s_use_ii true \
 --data.eval_phase test --batch_size_vid 4 \
 --s_load_path "$ROOT/checkpoints/$LVD" \
 --s_pg_load_path "$ROOT/checkpoints/$FLP" \
 --s_ii_load_path "$ROOT/checkpoints/$WIF"

echo "=== offline metrics ==="
python -m waldo_tpu.eval.metrics e2e_test 6 3 \
 --results_root "$ROOT/results" --metrics ssim psnr --fake_folder pred_vid
