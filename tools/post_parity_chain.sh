#!/bin/sh
# Waits for the loan_account parity run to finish (aggregate block written),
# then re-validates benches with the fixed host-fetch sync on the free chip,
# then launches the remaining parity suite.
cd "$(dirname "$0")/.."
while ! grep -q "examples_per_s" results/loan_account_base/log_all.txt 2>/dev/null; do
  sleep 30
done
echo "=== parity run finished; benches ==="
timeout 590 python bench.py > results/bench_flagship.json 2>results/bench_flagship.err
timeout 590 python bench.py --seq_len 150 --kernels xla > results/bench_amz_xla.json 2>/dev/null
timeout 590 python bench.py --seq_len 150 --kernels auto > results/bench_amz_pallas.json 2>/dev/null
timeout 1200 python tools/bench_kernels.py > results/bench_kernels.txt 2>&1
echo "=== benches done; parity suite ==="
sh tools/run_parity_suite.sh
