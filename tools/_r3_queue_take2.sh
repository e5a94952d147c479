#!/bin/sh
# Round-3 restart queue, take 2 — reordered after the VM restart so the
# quick high-value items land before the long 5-seed extensions. Serial
# (one TPU chip). Everything here is load-robust next to the reference-DR
# CPU job: metric drives by nature, benches via the device-loop harness.
cd /root/repo

# 1. bf16 metric-parity twin (fp32 twin already done: results/bf16_drive_fp32)
timeout 1200 python train_sr.py --epoch 3 --seeds 1 -ds mybank \
  -dm loan_account --overlap_ratio 0.25 --model sasrec --isItC True \
  --ts2 0.4 --neg_nums 99 --seq_len 20 --bf16 True -md results/bf16_drive/ \
  > results/bf16_drive.out 2>&1
echo done > results/_q_bf16.done

# 2. small-n affinity on-chip A/B (device_time loop)
timeout 2400 python tools/bench_kernels.py --kernel affinity \
  > results/affinity_chip.out 2>&1
echo done > results/_q_affinity.done

# 3. serve full-catalog top-K on chip (device-loop)
timeout 1800 python tools/bench_serve.py > results/serve_bench.out 2>&1
echo done > results/_q_serve.done

# 4. C2DSR on real data (shipped overlap split = 0.25)
timeout 3600 python train_sr.py -ds amazon -dm cloth_sport --model sasrec \
  --overlap_ratio 0.25 --isC2DSR True --epoch 3 --seeds 1 --neg_nums 199 \
  --seq_len 150 -md results/c2dsr_drive/ > results/c2dsr_drive.out 2>&1
echo done > results/_q_c2dsr.done

# 5. device-loop bench mini-suite: validates the new default harness,
#    measures bf16 throughput (VERDICT item 5) and the fused 3-array
#    scatter A/B, plus a host-loop control to document the load effect.
{
  echo "flagship device_loop (lazy+pallas, default):"
  timeout 1800 python bench.py --seq_len 20 2>&1 | tail -1
  echo "flagship host_loop control (under ref-DR CPU load — expect garbage):"
  timeout 1800 python bench.py --seq_len 20 --host_loop 2>&1 | tail -1
  echo "bf16 device_loop:"
  timeout 1800 python bench.py --seq_len 20 --bf16 2>&1 | tail -1
  echo "fused scatter3 device_loop:"
  timeout 1800 python bench.py --seq_len 20 --fused_scatter 2>&1 | tail -1
  echo "fused scatter3 phase_b device_loop:"
  timeout 1800 python bench.py --seq_len 20 --phase_b --fused_scatter 2>&1 | tail -1
  echo "phase_b device_loop (three-call control):"
  timeout 1800 python bench.py --seq_len 20 --phase_b 2>&1 | tail -1
} > results/bench_device_loop.out 2>&1
echo done > results/_q_devloop.done

# 6. 5-seed flagship upgrades (VERDICT item 4): seeds 3-4 on top of the
#    committed 0-2. Quick one first.
timeout 2400 python train_sr.py --overlap_ratio 0.25 -ds mybank \
  -dm loan_account --model sasrec --overlap True --isItC True --ts2 0.4 \
  --neg_nums 999 --epoch 50 --seeds 2 --seed_offset 3 \
  -md results/loan_account_quirk_s34/ \
  > results/loan_account_quirk_s34.out 2>&1
echo done > results/_q_quirk34.done

timeout 4200 sh run.sh -dm loan_fund --epoch 50 --seeds 2 --seed_offset 3 \
  -md results/loan_fund_dr_s34/ > results/loan_fund_dr_s34.out 2>&1
echo done > results/_q_dr34.done

echo done > results/_q_all.done
