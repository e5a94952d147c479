#!/bin/sh
# Round-3 RESTART queue — the VM restart killed the original chip queue and
# lost its uncommitted artifacts. Serial (one TPU chip); ordered so the
# highest-value VERDICT items land first. Metric-accuracy runs are robust
# under the concurrent reference-DR CPU job (CLAUDE.md); the two device-loop
# benches (affinity, serve) are load-robust too. Host-driven step timings
# (bench.py) are deliberately NOT here — they need a quiet host.
cd /root/repo

# 1. amid A/B twin of the reference DR run (VERDICT item 1b -> PARITY SD)
timeout 2400 python train_sr_dr.py --epoch 1 --seeds 2 -ds mybank \
  -dm loan_fund --overlap_ratio 0.25 --model sasrec --isItC True \
  --ts2 0.4 --neg_nums 999 --lr2 0.01 --dr_e_w 0.01 --isDR True \
  --seq_len 20 -md results/amid_ab_loan_fund_dr/ \
  > results/amid_ab_loan_fund_dr.out 2>&1
echo done > results/_q_ab_dr.done

# 2. C2DSR on real data (VERDICT item 7)
timeout 3600 python train_sr.py -ds amazon -dm cloth_sport --model sasrec \
  --isC2DSR True --epoch 3 --seeds 1 --neg_nums 199 --seq_len 150 \
  -md results/c2dsr_drive/ > results/c2dsr_drive.out 2>&1
echo done > results/_q_c2dsr.done

# 3. bf16 metric-parity drives (VERDICT item 5)
timeout 1200 python train_sr.py --epoch 3 --seeds 1 -ds mybank \
  -dm loan_account --overlap_ratio 0.25 --model sasrec --isItC True \
  --ts2 0.4 --neg_nums 99 --seq_len 20 -md results/bf16_drive_fp32/ \
  > results/bf16_drive_fp32.out 2>&1
timeout 1200 python train_sr.py --epoch 3 --seeds 1 -ds mybank \
  -dm loan_account --overlap_ratio 0.25 --model sasrec --isItC True \
  --ts2 0.4 --neg_nums 99 --seq_len 20 --bf16 True -md results/bf16_drive/ \
  > results/bf16_drive.out 2>&1
echo done > results/_q_bf16.done

# 4. small-n affinity on-chip A/B (device_time loop — load-robust)
timeout 2400 python tools/bench_kernels.py --kernel affinity \
  > results/affinity_chip.out 2>&1
echo done > results/_q_affinity.done

# 5. 5-seed flagship upgrades (VERDICT item 4): seeds 3-4 only, the
#    committed 3-seed logs cover 0-2.
timeout 4200 sh run.sh -dm loan_fund --epoch 50 --seeds 2 --seed_offset 3 \
  -md results/loan_fund_dr_s34/ > results/loan_fund_dr_s34.out 2>&1
timeout 2400 python train_sr.py --overlap_ratio 0.25 -ds mybank \
  -dm loan_account --model sasrec --overlap True --isItC True --ts2 0.4 \
  --neg_nums 999 --epoch 50 --seeds 2 --seed_offset 3 \
  -md results/loan_account_quirk_s34/ \
  > results/loan_account_quirk_s34.out 2>&1
echo done > results/_q_5seed.done

# 6. serve full-catalog top-K on chip (device-loop — load-robust)
timeout 1800 python tools/bench_serve.py > results/serve_bench.out 2>&1
echo done > results/_q_serve.done

echo done > results/_q_all.done
