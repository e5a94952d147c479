#!/bin/sh
# Clean perf pass once the parity suite is done (sole owner of the chip).
cd "$(dirname "$0")/.."
while ! grep -q "examples_per_s" results/loan_fund_dr/log_all.txt 2>/dev/null; do
  sleep 30
done
echo "=== suite done; perf pass ==="
timeout 590 python bench.py                        > results/final_bench_dense.json 2>/dev/null
timeout 590 python bench.py --lazy                 > results/final_bench_lazy.json 2>/dev/null
timeout 590 python bench.py --seq_len 150 --kernels xla  > results/final_bench_amz_xla.json 2>/dev/null
timeout 590 python bench.py --seq_len 150 --kernels auto > results/final_bench_amz_pallas.json 2>/dev/null
timeout 1800 python tools/bench_kernels.py         > results/final_bench_kernels.txt 2>&1
echo "=== perf pass done ==="
