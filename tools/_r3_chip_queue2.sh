#!/bin/sh
# Round-3 chip queue, take 2: wait for bench_serve ($1), re-run the fixed
# perf_pass in full, then the rest of the original queue.
PID="$1"
while [ -n "$PID" ] && kill -0 "$PID" 2>/dev/null; do
  sleep 20
done
cd /root/repo

timeout 3600 python tools/perf_pass.py > results/perf_pass_r3.out 2>&1

timeout 1200 python bench.py --seq_len 20 --bf16 > results/bench_bf16.out 2>&1
timeout 1200 python bench.py --seq_len 150 --bf16 >> results/bench_bf16.out 2>&1

timeout 1200 python train_sr.py --epoch 3 --seeds 1 -ds mybank \
  -dm loan_account --overlap_ratio 0.25 --model sasrec --isItC True \
  --ts2 0.4 --neg_nums 99 --seq_len 20 -md results/bf16_drive_fp32/ \
  > results/bf16_drive_fp32.out 2>&1
timeout 1200 python train_sr.py --epoch 3 --seeds 1 -ds mybank \
  -dm loan_account --overlap_ratio 0.25 --model sasrec --isItC True \
  --ts2 0.4 --neg_nums 99 --seq_len 20 --bf16 True -md results/bf16_drive/ \
  > results/bf16_drive.out 2>&1

timeout 2400 python tools/bench_kernels.py --kernel affinity \
  > results/affinity_chip.out 2>&1

timeout 3600 python tools/bench_scaling.py \
  --items-sweep 894820,2000000,4000000,6000000,8000000 --batch 256 \
  --out results/scaling_chip.json > results/scaling_chip.out 2>&1

timeout 2400 python train_sr.py --epoch 3 --seeds 2 -ds mybank \
  -dm loan_account --overlap_ratio 0.25 --model sasrec --isItC True \
  --ts2 0.4 --neg_nums 999 --seq_len 20 -md results/amid_ab_loan_account/ \
  > results/amid_ab_loan_account.out 2>&1
timeout 2400 python train_sr_dr.py --epoch 1 --seeds 2 -ds mybank \
  -dm loan_fund --overlap_ratio 0.25 --model sasrec --isItC True \
  --ts2 0.4 --neg_nums 999 --lr2 0.01 --dr_e_w 0.01 --isDR True \
  --seq_len 20 -md results/amid_ab_loan_fund_dr/ \
  > results/amid_ab_loan_fund_dr.out 2>&1

timeout 9000 sh run.sh -dm loan_fund --epoch 50 --seeds 5 \
  -md results/loan_fund_dr5/ > results/loan_fund_dr5.out 2>&1
timeout 9000 python train_sr.py --overlap_ratio 0.25 -ds mybank \
  -dm loan_account --model sasrec --overlap True --isItC True --ts2 0.4 \
  --neg_nums 999 --epoch 50 --seeds 5 -md results/loan_account_quirk5/ \
  > results/loan_account_quirk5.out 2>&1

timeout 3600 python train_sr.py -ds amazon -dm cloth_sport --model sasrec \
  --isC2DSR True --epoch 3 --seeds 1 --neg_nums 199 --seq_len 150 \
  -md results/c2dsr_drive/ > results/c2dsr_drive.out 2>&1

echo done > results/_r3_chip_queue.done
