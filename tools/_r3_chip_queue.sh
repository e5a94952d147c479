#!/bin/sh
# Round-3 serial chip queue (one TPU chip — jobs must not overlap).
# Gated on the perf_pass pid passed as $1. Logs to results/.
PID="$1"
while [ -n "$PID" ] && kill -0 "$PID" 2>/dev/null; do
  sleep 30
done
cd /root/repo

# --- quick measurements (VERDICT r2 missing #4 / item 5) ---
timeout 1800 python tools/bench_serve.py > results/serve_bench.out 2>&1

timeout 1200 python bench.py --seq_len 20 --bf16 > results/bench_bf16.out 2>&1
timeout 1200 python bench.py --seq_len 150 --bf16 >> results/bench_bf16.out 2>&1

# bf16 metric-parity drive: 3 epochs loan_account, fp32 vs bf16 matmuls
timeout 1200 python train_sr.py --epoch 3 --seeds 1 -ds mybank \
  -dm loan_account --overlap_ratio 0.25 --model sasrec --isItC True \
  --ts2 0.4 --neg_nums 99 --seq_len 20 -md results/bf16_drive_fp32/ \
  > results/bf16_drive_fp32.out 2>&1
timeout 1200 python train_sr.py --epoch 3 --seeds 1 -ds mybank \
  -dm loan_account --overlap_ratio 0.25 --model sasrec --isItC True \
  --ts2 0.4 --neg_nums 99 --seq_len 20 --bf16 True -md results/bf16_drive/ \
  > results/bf16_drive.out 2>&1

# small-n affinity on-chip A/B at mybank shapes (+ the rest of the kernel set)
timeout 2400 python tools/bench_kernels.py --kernel affinity \
  > results/affinity_chip.out 2>&1

# single-chip items sweep: largest-fitting table (VERDICT item 3, SURVEY §7)
timeout 3600 python tools/bench_scaling.py \
  --items-sweep 894820,2000000,4000000,6000000,8000000 --batch 256 \
  --out results/scaling_chip.json > results/scaling_chip.out 2>&1

# --- amid-side A/B twins of the reference CPU runs (VERDICT item 1) ---
timeout 2400 python train_sr.py --epoch 3 --seeds 2 -ds mybank \
  -dm loan_account --overlap_ratio 0.25 --model sasrec --isItC True \
  --ts2 0.4 --neg_nums 999 --seq_len 20 -md results/amid_ab_loan_account/ \
  > results/amid_ab_loan_account.out 2>&1
timeout 2400 python train_sr_dr.py --epoch 1 --seeds 2 -ds mybank \
  -dm loan_fund --overlap_ratio 0.25 --model sasrec --isItC True \
  --ts2 0.4 --neg_nums 999 --lr2 0.01 --dr_e_w 0.01 --isDR True \
  --seq_len 20 -md results/amid_ab_loan_fund_dr/ \
  > results/amid_ab_loan_fund_dr.out 2>&1

# --- 5-seed upgrades of the flagship tables (VERDICT item 4) ---
timeout 9000 sh run.sh -dm loan_fund --epoch 50 --seeds 5 \
  -md results/loan_fund_dr5/ > results/loan_fund_dr5.out 2>&1
timeout 9000 python train_sr.py --overlap_ratio 0.25 -ds mybank \
  -dm loan_account --model sasrec --overlap True --isItC True --ts2 0.4 \
  --neg_nums 999 --epoch 50 --seeds 5 -md results/loan_account_quirk5/ \
  > results/loan_account_quirk5.out 2>&1

# --- C2DSR on real data (VERDICT item 7) ---
timeout 3600 python train_sr.py -ds amazon -dm cloth_sport --model sasrec \
  --isC2DSR True --epoch 3 --seeds 1 --neg_nums 199 --seq_len 150 \
  -md results/c2dsr_drive/ > results/c2dsr_drive.out 2>&1

echo done > results/_r3_chip_queue.done
