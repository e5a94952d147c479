#!/bin/sh
# Sequential parity runs (each waits for the TPU to be free).
# Usage: nohup sh tools/run_parity_suite.sh > results/parity_suite.out 2>&1 &
set -x
cd "$(dirname "$0")/.."

# 2) amazon cloth_sport base, 25% split (reference protocol seq_len 150)
timeout 14400 python train_sr.py --overlap_ratio 0.25 -ds amazon \
  -dm cloth_sport --model sasrec --overlap True --isItC True --ts2 0.4 \
  --neg_nums 199 --seq_len 150 --epoch 50 --seeds 3 \
  --checkpoint False -md results/cloth_sport_base/

# 3) mybank loan_fund DR (canonical DR schedule; loan_fund ships _DR splits)
timeout 14400 python train_sr_dr.py --overlap_ratio 0.25 -ds mybank \
  -dm loan_fund --model sasrec --overlap True --isItC True --ts2 0.4 \
  --neg_nums 999 --lr2 0.01 --dr_e_w 0.01 --isDR True --seq_len 20 \
  --epoch 50 --seeds 3 --checkpoint False -md results/loan_fund_dr/
