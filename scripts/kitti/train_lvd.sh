#!/bin/bash
# LVD training on Cityscapes (reference scripts/cityscapes/train_lvd.sh).
# Single-command launch; multi-host TPU slices set WALDO_MULTIHOST=1 per host.

python -m waldo_tpu.cli.train \
 --name train_lvd_kitti \
 --dataset kitti --data.load_all true --dim 128 --true_dim 128 \
 --data.vid_len 10 --data.num_workers 16 --data.shuffle_valid true \
 --num_iter 1000000 --num_iter_eval 10000 --save_latest_freq 1000 --log_freq 10000 \
 --s_patch_size 16 --s_latent_shape 8,26 --s_embed_dim 512 --s_num_obj 16 \
 --s_use_pe true \
 --vid_modes vid_object_extractor \
 --s_vid_object_extractor_losses "ent_flt_edge l1_flow cell_dis reg_mov" \
 --s_blur_pxl true --s_blur_sigma 2.0 \
 --batch_size_vid 8 --max_batch_eval_vid 8 \
 --s_lambda_pts_rest 20 --s_l1_pxl true \
 --s_oe_depth 2 --s_pe_depth 2 --s_bound_rest true --s_soft_bound_rest true \
 --s_pe_decoder_init_mode five --s_has_bg true \
 --s_pe_estimator_init_mode "" --s_pad_obj_alpha 3 --s_pad_bg_alpha 3 \
 --s_init_scale_obj 0.25 --s_mul_scale_obj 0.25 --s_mul_delta_obj 0.2 \
 --s_circle_translate_bias true --s_circle_translate_radius 0.2 \
 --data.skip_first true --data.load_lyt true --data.load_flow true \
 --s_input_lyt true --s_input_flow true --s_input_rgb false \
 --data.remap_lyt "12 18 17 18 6 5 7 5" --s_reg_bg_mul 0.25 \
 --s_lambda_cell_dis 10 --s_lambda_l1_flow 1000 \
 --data.max_zoom 1.3 --data.no_v_flip false \
 --data.colorjitter 0.5 --data.colorjitter_no_contrast true \
 --s_lambda_reg_mov 10 --s_use_lyt_filtering true --s_use_fg true \
 --s_use_lyt_opacity true --s_swap_flt true --s_mov_obj_thresh 0.005 \
 --s_use_dominant_flow_other true \
 --s_pred_cls true --s_weight_cls true --s_min_cls 0.1 \
 --s_ctx_mode prev --s_include_self true \
 --s_edge_size 15 --s_flow_thresh 0.02 --s_bg_mul 1.2 \
 --s_ctx_len 4 \
 "$@"
