#!/bin/sh
# Single serial chain after take-2: quick serve re-bench first, then the
# take-3 BASELINE regenerations (inc_drive, cloth_sport DR, phone_elec).
while [ ! -f /root/repo/results/_q_all.done ]; do sleep 60; done
cd /root/repo

timeout 1800 python tools/bench_serve.py --tiles 8192,16384,65536,262144 \
  --out results/serve_bench_fused.json > results/serve_bench_fused.out 2>&1
echo done > results/_q_serve_fused.done

timeout 1800 python train_sr.py --epoch 2 --seeds 1 -ds mybank \
  -dm loan_account --overlap_ratio 0.25 --model sasrec --isInC True \
  --ts1 0.5 --neg_nums 99 --seq_len 20 -md results/inc_drive/ \
  > results/inc_drive.out 2>&1
echo done > results/_q_inc.done

timeout 7200 python train_sr_dr.py --epoch 50 --seeds 3 -ds amazon \
  -dm cloth_sport --overlap_ratio 0.25 --model sasrec --isItC True \
  --ts2 0.4 --neg_nums 199 --lr2 0.01 --dr_e_w 0.01 --isDR True \
  --seq_len 150 --overlap True -md results/cloth_sport_dr/ \
  > results/cloth_sport_dr.out 2>&1
echo done > results/_q_cloth_dr.done

timeout 7200 python train_sr.py --epoch 50 --seeds 3 -ds amazon \
  -dm phone_elec --overlap_ratio 0.25 --model sasrec --isItC True \
  --ts2 0.4 --neg_nums 199 --seq_len 150 --overlap True \
  -md results/phone_elec_base/ > results/phone_elec_base.out 2>&1
echo done > results/_q_phone_elec.done

echo done > results/_q_take3.done
