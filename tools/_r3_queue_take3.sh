#!/bin/sh
# Round-3 queue take 3 — chained after take 2. Regenerates the two BASELINE
# tables whose result dirs were never committed (phone_elec_base, inc_drive
# — cited in BASELINE.md since round 1 but absent from git), and adds the
# BASELINE.json config 4 that has never run amid-side: DR on the amazon
# cloth_sport _DR split (the only DR split shipped for amazon).
while [ ! -f /root/repo/results/_q_all.done ]; do sleep 60; done
cd /root/repo

# 1. InnerComp functional drive on real data (BASELINE.md inc_drive row)
timeout 1800 python train_sr.py --epoch 2 --seeds 1 -ds mybank \
  -dm loan_account --overlap_ratio 0.25 --model sasrec --isInC True \
  --ts1 0.5 --neg_nums 99 --seq_len 20 -md results/inc_drive/ \
  > results/inc_drive.out 2>&1
echo done > results/_q_inc.done

# 2. DR two-phase schedule on cloth_sport _DR (BASELINE.json config 4)
timeout 7200 python train_sr_dr.py --epoch 50 --seeds 3 -ds amazon \
  -dm cloth_sport --overlap_ratio 0.25 --model sasrec --isItC True \
  --ts2 0.4 --neg_nums 199 --lr2 0.01 --dr_e_w 0.01 --isDR True \
  --seq_len 150 --overlap True -md results/cloth_sport_dr/ \
  > results/cloth_sport_dr.out 2>&1
echo done > results/_q_cloth_dr.done

# 3. phone_elec base table regenerated under the current (quirk) default
timeout 7200 python train_sr.py --epoch 50 --seeds 3 -ds amazon \
  -dm phone_elec --overlap_ratio 0.25 --model sasrec --isItC True \
  --ts2 0.4 --neg_nums 199 --seq_len 150 --overlap True \
  -md results/phone_elec_base/ > results/phone_elec_base.out 2>&1
echo done > results/_q_phone_elec.done

echo done > results/_q_take3.done
