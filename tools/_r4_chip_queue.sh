#!/bin/sh
# Round-4 serial chip queue — chained behind the r3 take-2/take-3 chain
# (waits for its last marker). Order = judge priority (VERDICT r3):
#   1. loan_fund train100       (BASELINE.json config 3 — never trained)
#   2. cloth_sport train75      (shipped train75 split — the runnable
#                                overlap-ratio-0.75 axis; phone_elec t75
#                                is unregenerable, BASELINE.md)
#   3. batch 4096/8192 capability rows (VERDICT #5; 512-2048 in r3 sweep)
#   4. scaling_chip re-measure  (device-loop harness, drop disavowed nums)
#   5. perf_pass full re-emit   (lazy_breakdown + dense_backward_hlo keys)
#   6. loan_account train75     (bonus mybank 0.75 axis)
while [ ! -f /root/repo/results/_q_batch_sweep.done ]; do sleep 60; done
cd /root/repo

timeout 10800 python train_sr.py --epoch 50 --seeds 3 -ds mybank \
  -dm loan_fund --overlap_ratio 1.0 --model sasrec --isItC True \
  --ts2 0.4 --neg_nums 999 --seq_len 20 --overlap True \
  -md results/loan_fund_train100/ > results/loan_fund_train100.out 2>&1
echo done > results/_q_lf100.done

timeout 7200 python train_sr.py --epoch 50 --seeds 3 -ds amazon \
  -dm cloth_sport --overlap_ratio 0.75 --model sasrec --isItC True \
  --ts2 0.4 --neg_nums 199 --seq_len 150 --overlap True \
  -md results/cloth_sport_train75/ > results/cloth_sport_train75.out 2>&1
echo done > results/_q_cs75.done

{
  for B in 4096 8192; do
    echo "batch=$B device_loop:"
    timeout 1800 python bench.py --seq_len 20 --batch $B 2>&1 | tail -1
  done
} > results/bench_batch_big.out 2>&1
echo done > results/_q_batch_big.done

timeout 5400 python tools/bench_scaling.py \
  --items-sweep 894820,2000000,4000000,6000000,8000000 --batch 256 \
  --out results/scaling_chip.json > results/scaling_chip.out 2>&1
echo done > results/_q_scaling_chip.done

timeout 5400 python tools/perf_pass.py > results/perf_pass.out 2>&1
echo done > results/_q_perf_pass.done

timeout 10800 python train_sr.py --epoch 50 --seeds 3 -ds mybank \
  -dm loan_account --overlap_ratio 0.75 --model sasrec --isItC True \
  --ts2 0.4 --neg_nums 999 --seq_len 20 --overlap True \
  -md results/loan_account_train75/ > results/loan_account_train75.out 2>&1
echo done > results/_q_la75.done

echo done > results/_q_r4_queue.done
