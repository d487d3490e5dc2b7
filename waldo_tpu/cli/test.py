"""Inference/eval CLI (reference helpers/synthesizer_evaluator.py entry).

  python -m waldo_tpu.cli.test --dataset cityscapes --eval_phase test \
      --s_load_path checkpoints/LVD_TAG --s_pg_load_path checkpoints/FLP_TAG \
      --s_ii_load_path checkpoints/WIF_TAG ...

Dumps real/rec/pred/inp_pred videos under results/<signature>/ for the
offline metrics tool (python -m waldo_tpu.eval.metrics TAG LEN CTX).
"""
from __future__ import annotations

from ..config import parse_cli
from ..train import Evaluator


def main(argv=None):
    cfg = parse_cli(argv)
    metrics = Evaluator(cfg).run(dump=True)
    for k, v in metrics.items():
        print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
