#!/usr/bin/env python
"""Base trainer CLI — the reference `train_sr.py` equivalent.

Example (reference protocol, train_sr.py:357-392):
    python train_sr.py --overlap_ratio 0.25 -ds amazon -dm cloth_sport \
        --model sasrec --seq_len 150 --neg_nums 199
"""

from amid_tpu.config import parse_cli
from amid_tpu.train.loop import run

if __name__ == "__main__":
    cfg = parse_cli(is_dr=False)
    cfg.model.is_dr = False
    run(cfg)
