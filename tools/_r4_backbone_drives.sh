#!/bin/sh
# Functional real-data drives for the non-flagship backbones (GRU4Rec,
# BERT4Rec) — every backbone exercised end to end on a shipped split, not
# just unit oracles. 2 epochs x 1 seed, mybank loan_account train25,
# 99 negs (the quick-drive config from .claude/skills/verify).
cd /root/repo

timeout 2400 python train_sr.py --epoch 2 --seeds 1 -ds mybank \
  -dm loan_account --overlap_ratio 0.25 --model gru4rec --isItC True \
  --ts2 0.4 --neg_nums 99 --seq_len 20 --overlap True \
  -md results/gru4rec_drive/ > results/gru4rec_drive.out 2>&1
echo done > results/_q_gru_drive.done

timeout 2400 python train_sr.py --epoch 2 --seeds 1 -ds mybank \
  -dm loan_account --overlap_ratio 0.25 --model bert4rec --isItC True \
  --ts2 0.4 --neg_nums 99 --seq_len 20 --overlap True \
  -md results/bert4rec_drive/ > results/bert4rec_drive.out 2>&1
echo done > results/_q_bert_drive.done
