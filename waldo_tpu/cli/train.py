"""Training CLI (reference helpers/synthesizer_trainer.py entry).

  python -m waldo_tpu.cli.train --dataset cityscapes --name train_lvd ...

Flags mirror the reference (`--s_*` model flags accepted); see
waldo_tpu/config.py. Multi-host runs set WALDO_MULTIHOST=1 per process.
"""
from __future__ import annotations

from ..config import parse_cli
from ..train import Trainer


def main(argv=None):
    cfg = parse_cli(argv)
    Trainer(cfg).run()


if __name__ == "__main__":
    main()
