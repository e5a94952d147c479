#!/bin/sh
# Canonical config — the reference's run.sh:1 equivalent:
#   SASRec + InterComp (ts2 0.4), DR estimator, mybank loan_account,
#   25% overlap split, 999 eval negatives, overlap-bucketed metrics.
# NOTE: the mounted reference copy is missing loan_account_train{25,75}_DR.csv
# (large-blob stripped, BASELINE.md) — regenerate them from a train100 CSV via
#   python tools/filter_dr_dataset.py <loan_account_train100.csv> out --ratios 0.25
# or run the DR config on loan_fund / amazon cloth_sport whose _DR splits ship.
python train_sr_dr.py --overlap_ratio 0.25 -ds mybank -dm loan_account \
  --model sasrec --overlap True --isItC True --ts2 0.4 --neg_nums 999 \
  --lr2 0.01 --dr_e_w 0.01 --isDR True "$@"
