#!/bin/sh
# Round-3 chain: wait for the loan_account reference run (pid $1) to finish,
# then run the reference DR schedule on loan_fund (VERDICT r2 missing #1b).
PID="$1"
while kill -0 "$PID" 2>/dev/null; do
  sleep 60
done
cd /root/repo
timeout 21600 python tools/run_reference_cpu_dr.py --dataset_type mybank \
  --domain_type loan_fund --model sasrec --isItC --ts2 0.4 \
  --neg_nums 999 --lr2 0.01 --dr_e_w 0.01 --epoch 1 --seeds 2 --save_ckpt \
  --out results/reference_cpu_loan_fund_dr
