#!/bin/bash
# Reference acceptance loop (VERDICT r4 #2), end-to-end through the OFFICIAL
# scripts: scripts/cityscapes/test.sh -> video dumps -> eval.metrics CLI,
# exactly the reference protocol (README.md:129-132, tools/eval/metrics.py:
# 109-113), driven on the trend run's trained checkpoints at the reference
# eval geometry (load_dim 512 -> 512x1024 output).
#
# Usage: bash scripts/acceptance_loop.sh [trend_root]
set -eu
cd "$(dirname "$0")/.."
ROOT=${1:-/tmp/waldo_real_trend}
RUN="$ROOT/run"
# NO persistent compile cache here: the eval's big predict graph behaves
# like bench.py's rollout — its ~80 MB cache entry crosses the axon tunnel
# on write AND hit, each slower than recompiling (r4: 9m40 cache-hit runs
# vs ~60 s fresh compile). Small-compile savings don't offset that.
unset JAX_COMPILATION_CACHE_DIR

latest() { ls "$RUN/checkpoints" | grep "$1" | sort | tail -1; }
LVD=$(latest real_lvd); FLP=$(latest real_flp); WIF=$(latest real_wif)
echo "checkpoints: $LVD / $FLP / $WIF"

# drop stale result dirs for the tag (fresh datetime signature per run)
rm -rf "$RUN"/results/*test_cityscapes 2>/dev/null || true

# extra args after the 3 tags override test.sh defaults (later flag wins):
# trend-width nets (embed 256), trend dataroot/save_path, absolute
# checkpoint paths, and the 4-window eval set
bash scripts/cityscapes/test.sh "$LVD" "$FLP" "$WIF" \
  --dataroot "$ROOT/data" \
  --save_path "$RUN" \
  --s_embed_dim 256 \
  --s_load_path "$RUN/checkpoints/$LVD" \
  --s_pg_load_path "$RUN/checkpoints/$FLP" \
  --s_ii_load_path "$RUN/checkpoints/$WIF" \
  --max_batch_eval_vid 4 --data.num_workers 4 \
  --compute_dtype bfloat16 --s_fast_inverse_warp true
# ^ bench numerics at the HD eval geometry: the f32 + exact-scatter
# configuration RESOURCE_EXHAUSTs the chip at 512x1024 batch 1 (first
# r5 acceptance attempt); bf16 passes + iterative inversion are the HD
# configuration every official bench runs, bounded vs the golden f32
# pipeline by evidence_precision_audit.json (56.9 dB / 0.9997 SSIM).

echo "=== metrics (reference CLI protocol: TAG LEN CTX) ==="
python -m waldo_tpu.eval.metrics test_cityscapes 14 4 \
  --results_root "$RUN/results" --metrics ssim psnr msssim \
  --fake_folder inp_pred_vid
