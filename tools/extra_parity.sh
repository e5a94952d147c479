#!/bin/sh
# Extra coverage after the final perf pass: amazon phone_elec (largest
# shipped split) + an InnerComp-path drive.
cd "$(dirname "$0")/.."
while ! grep -q "perf pass done" results/final_perf.out 2>/dev/null; do
  sleep 30
done
timeout 14400 python train_sr.py --overlap_ratio 0.25 -ds amazon \
  -dm phone_elec --model sasrec --overlap True --isItC True --ts2 0.4 \
  --neg_nums 199 --seq_len 150 --epoch 50 --seeds 3 \
  --checkpoint False -md results/phone_elec_base/

timeout 3600 python train_sr.py --overlap_ratio 0.25 -ds mybank \
  -dm loan_account --model sasrec --isInC True --ts1 0.5 --neg_nums 99 \
  --seq_len 20 --epoch 2 --seeds 1 --checkpoint False \
  -md results/inc_drive/
