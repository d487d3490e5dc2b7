#!/bin/bash
# Full pipeline inference on Cityscapes (reference scripts/cityscapes/test.sh).
# Usage: test.sh LVD_TAG FLP_TAG WIF_TAG
LVD_TAG=$1
FLP_TAG=$2
WIF_TAG=$3

python -m waldo_tpu.cli.test \
 --name test_cityscapes \
 --dataset cityscapes --dim 128 --load_dim 512 --true_dim 512 --flow_dim 128 \
 --data.vid_len 14 --data.num_workers 8 \
 --s_patch_size 16 --s_latent_shape 8,16 --s_embed_dim 512 --s_num_obj 16 \
 --s_use_pe true --s_use_ii true --s_use_pg true \
 --vid_modes vid_prediction \
 --s_oe_depth 2 --s_pe_depth 2 --s_bound_rest true --s_soft_bound_rest true \
 --s_pe_decoder_init_mode five --s_has_bg true \
 --s_pe_estimator_init_mode zero --s_pad_obj_alpha 3 --s_pad_bg_alpha 3 \
 --s_init_scale_obj 0.25 --s_mul_scale_obj 0.25 --s_mul_delta_obj 0.2 \
 --s_circle_translate_bias true --s_circle_translate_radius 0.2 \
 --data.skip_first true --s_ctx_len 4 --data.load_lyt true --data.load_flow true \
 --s_input_lyt true --s_input_flow true --s_input_rgb false \
 --data.remap_lyt "13 19 18 19 7 6 8 6" \
 --s_pred_cls true --s_weight_cls true --s_min_cls 0.1 \
 --s_which_iter latest --s_load_path "checkpoints/${LVD_TAG}" \
 --s_ctx_mode prev --s_ii_score true --s_ii_ab true \
 --s_edge_size 15 --s_flow_thresh 0.02 --s_bg_mul 1.2 \
 --s_unconstrained_pose_decoder true \
 --s_oe_num_timesteps 5 --s_pg_num_timesteps 14 \
 --s_ii_depth 6 \
 --s_ii_iter latest --s_ii_load_path "checkpoints/${WIF_TAG}" \
 --s_pg_iter latest --s_pg_load_path "checkpoints/${FLP_TAG}" \
 --batch_size_vid 1 --data.eval_phase test \
 --s_use_last_pose_decoder true --s_bg_mul_pose_decoder 1.2 --s_restrict_to_ctx true \
 "${@:4}"
