#!/bin/sh
# Wait for the cloth_sport reference run to finish, then run loan_account+ItC.
while [ ! -f /root/repo/results/reference_cpu_cloth_sport/summary.json ]; do
  # bail if the cloth_sport process died without producing a summary
  if ! pgrep -f run_reference_cpu >/dev/null 2>&1; then
    sleep 30
    [ -f /root/repo/results/reference_cpu_cloth_sport/summary.json ] && break
    echo "cloth_sport run died; starting loan_account anyway" >&2
    break
  fi
  sleep 60
done
cd /root/repo
timeout 18000 python tools/run_reference_cpu.py --dataset_type mybank \
  --domain_type loan_account --model sasrec --isItC --ts2 0.4 \
  --epoch 3 --seeds 2 --seq_len 20 --neg_nums 999 \
  --out results/reference_cpu_loan_account
