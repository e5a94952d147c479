#!/usr/bin/env python
"""Doubly-robust trainer CLI — the reference `train_sr_dr.py` equivalent.

Canonical config (run.sh:1):
    python train_sr_dr.py --overlap_ratio 0.25 -ds mybank -dm loan_account \
        --model sasrec --overlap True --isItC True --ts2 0.4 --neg_nums 999 \
        --lr2 0.01 --dr_e_w 0.01
"""

from amid_tpu.config import parse_cli
from amid_tpu.train.loop import run

if __name__ == "__main__":
    cfg = parse_cli(is_dr=True)
    cfg.model.is_dr = True
    run(cfg)
