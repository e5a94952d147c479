#!/bin/sh
# After the batch sweep: precision study — what does the MXU-native bf16
# default buy vs true-fp32 (highest) matmuls?
while [ ! -f /root/repo/results/_r3_batch_sweep.done ]; do sleep 60; done
cd /root/repo
{
  echo "seq20 highest:"
  timeout 1800 python bench.py --seq_len 20 --matmul_precision highest 2>&1 | tail -1
  echo "seq150 highest (kernels=xla for a pure-XLA comparison):"
  timeout 2400 python bench.py --seq_len 150 --kernels xla --matmul_precision highest 2>&1 | tail -1
  echo "seq150 default (kernels=xla reference point):"
  timeout 2400 python bench.py --seq_len 150 --kernels xla 2>&1 | tail -1
} > results/bench_precision.out 2>&1
echo done > results/_r3_precision.done
