#!/bin/sh
# VERDICT r1 weak #4: regenerate per-seed result artifacts behind BASELINE.md.
cd /root/repo
timeout 14000 python train_sr.py --model sasrec --isItC True --epoch 50 --seeds 3 \
  -ds amazon -dm cloth_sport --overlap_ratio 0.25 --seq_len 150 --neg_nums 199 \
  --overlap True --checkpoint False -md results/cloth_sport_base/ \
  > results/cloth_sport_base.out 2>&1
timeout 14000 python train_sr_dr.py --model sasrec --isItC True --ts2 0.4 --epoch 50 \
  --seeds 3 -ds mybank -dm loan_fund --overlap_ratio 0.25 --seq_len 20 \
  --neg_nums 999 --lr2 0.01 --dr_e_w 0.01 --overlap True --checkpoint False \
  -md results/loan_fund_dr/ > results/loan_fund_dr.out 2>&1
