#!/bin/bash
# WIF training on Cityscapes (reference scripts/cityscapes/train_wif.sh).
# Usage: train_wif.sh LVD_TAG
LVD_TAG=$1

python -m waldo_tpu.cli.train \
 --name train_wif_kitti \
 --dataset kitti --data.load_all true --dim 128 --load_dim 256 --true_dim 256 --flow_dim 128 \
 --data.vid_len 5 --data.load_vid_len 10 --data.load_n_plus_1 true \
 --data.num_workers 8 --data.shuffle_valid true \
 --num_iter 1000000 --num_iter_eval 10000 --save_latest_freq 1000 --log_freq 10000 \
 --s_patch_size 16 --s_latent_shape 8,26 --s_embed_dim 512 --s_num_obj 16 \
 --s_use_pe true --s_use_ii true \
 --vid_modes vid_inpainting \
 --s_vid_inpainting_losses "sharp_vid lpips_vid" \
 --batch_size_vid 8 --max_batch_eval_vid 8 --vid_metric loss \
 --s_oe_depth 2 --s_pe_depth 2 --s_bound_rest true --s_soft_bound_rest true \
 --s_pe_decoder_init_mode five --s_has_bg true \
 --s_pe_estimator_init_mode zero --s_pad_obj_alpha 3 --s_pad_bg_alpha 3 \
 --s_init_scale_obj 0.25 --s_mul_scale_obj 0.25 --s_mul_delta_obj 0.2 \
 --s_circle_translate_bias true --s_circle_translate_radius 0.2 \
 --data.skip_first true --s_ctx_len 4 --data.load_lyt true --data.load_flow true \
 --s_input_lyt true --s_input_flow true --s_input_rgb false \
 --data.remap_lyt "12 18 17 18 6 5 7 5" \
 --data.max_zoom 1.3 --data.no_v_flip false \
 --data.colorjitter 0.5 --data.colorjitter_no_contrast true \
 --s_pred_cls true --s_weight_cls true --s_min_cls 0.1 \
 --s_which_iter latest --s_load_path "checkpoints/${LVD_TAG}" \
 --s_ctx_mode prev --s_ii_score true --s_ii_ab true \
 --s_edge_size 15 --s_flow_thresh 0.02 --s_bg_mul 1.2 \
 --s_ii_depth 6 \
 "${@:2}"
