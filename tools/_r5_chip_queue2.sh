#!/bin/sh
# Round-5 queue continuation: items 4-7 of _r5_chip_queue.sh (the original
# was killed by a session restart mid-c2dsr; items 1-3 finished and are
# pooled into BASELINE.md). Same configs verbatim.
cd /root/repo

timeout 7200 python train_sr.py --epoch 50 --seeds 2 --seed_offset 3 \
  -ds amazon -dm cloth_sport --overlap_ratio 0.25 --model sasrec \
  --isC2DSR True --cl_w 0.1 --neg_nums 199 --seq_len 150 --overlap True \
  -md results/c2dsr_full_s34/ \
  > results/c2dsr_full_s34.out 2>&1
echo done > results/_q_r5_c2dsr.done

timeout 7200 python train_sr.py --epoch 50 --seeds 2 --seed_offset 3 \
  -ds mybank -dm loan_account --overlap_ratio 0.75 --model sasrec \
  --isItC True --ts2 0.4 --neg_nums 999 --seq_len 20 --overlap True \
  -md results/loan_account_train75_s34/ \
  > results/loan_account_train75_s34.out 2>&1
echo done > results/_q_r5_la75.done

timeout 7200 python train_sr.py --epoch 50 --seeds 2 --seed_offset 3 \
  -ds mybank -dm loan_fund --overlap_ratio 0.75 --model sasrec \
  --isItC True --ts2 0.4 --neg_nums 999 --seq_len 20 --overlap True \
  -md results/loan_fund_train75_s34/ \
  > results/loan_fund_train75_s34.out 2>&1
echo done > results/_q_r5_lf75.done

timeout 7200 python train_sr.py --epoch 50 --seeds 2 --seed_offset 3 \
  -ds amazon -dm cloth_sport --overlap_ratio 0.75 --model sasrec \
  --isItC True --ts2 0.4 --neg_nums 199 --seq_len 150 --overlap True \
  -md results/cloth_sport_train75_s34/ \
  > results/cloth_sport_train75_s34.out 2>&1
echo done > results/_q_r5_cs75.done

echo all_done > results/_q_r5_queue2.done
