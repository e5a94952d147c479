#!/bin/sh
# C2DSR retry with the shipped overlap split (train50 doesn't exist; the
# committed cloth_sport runs all use overlap_ratio 0.25). Waits for the
# restart queue to finish so chip jobs stay serial.
while [ ! -f /root/repo/results/_q_all.done ]; do sleep 60; done
cd /root/repo
timeout 3600 python train_sr.py -ds amazon -dm cloth_sport --model sasrec \
  --overlap_ratio 0.25 --isC2DSR True --epoch 3 --seeds 1 --neg_nums 199 \
  --seq_len 150 -md results/c2dsr_drive/ > results/c2dsr_drive.out 2>&1
echo done > results/_q_c2dsr.done
