#!/bin/sh
# Round-5 serial chip queue: extend every remaining 3-seed protocol table
# to the reference's 5 seeds (train_sr.py:439-443) with seeds 3-4 runs.
# Each invocation replicates the committed run dir's logged config exactly
# (ts2 differs per dir — cloth_sport_base used the 0.5 default).
# Pool afterwards with tools/report_results.py --merge.
cd /root/repo

timeout 7200 python train_sr.py --epoch 50 --seeds 2 --seed_offset 3 \
  -ds mybank -dm loan_fund --overlap_ratio 1.0 --model sasrec \
  --isItC True --ts2 0.4 --neg_nums 999 --seq_len 20 --overlap True \
  -md results/loan_fund_train100_s34/ \
  > results/loan_fund_train100_s34.out 2>&1
echo done > results/_q_r5_lf100.done

timeout 7200 python train_sr.py --epoch 50 --seeds 2 --seed_offset 3 \
  -ds amazon -dm cloth_sport --overlap_ratio 0.25 --model sasrec \
  --isItC True --neg_nums 199 --seq_len 150 --overlap True \
  -md results/cloth_sport_base_s34/ \
  > results/cloth_sport_base_s34.out 2>&1
echo done > results/_q_r5_csbase.done

timeout 7200 python train_sr.py --epoch 50 --seeds 2 --seed_offset 3 \
  -ds amazon -dm phone_elec --overlap_ratio 0.25 --model sasrec \
  --isItC True --ts2 0.4 --neg_nums 199 --seq_len 150 --overlap True \
  -md results/phone_elec_base_s34/ \
  > results/phone_elec_base_s34.out 2>&1
echo done > results/_q_r5_pebase.done

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

echo all_done > results/_q_r5_queue.done
