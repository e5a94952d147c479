#!/bin/sh
# After the serve re-measurement: batch-size capability sweep (lazy flagship).
while [ ! -f /root/repo/results/_r3_serve2.done ]; do sleep 60; done
cd /root/repo
{
  for B in 512 1024 2048; do
    echo "batch=$B:"
    timeout 1200 python bench.py --seq_len 20 --batch $B 2>&1 | tail -1
  done
  echo "batch=1024 bf16:"
  timeout 1200 python bench.py --seq_len 20 --batch 1024 --bf16 2>&1 | tail -1
} > results/bench_batch_sweep.out 2>&1
echo done > results/_r3_batch_sweep.done
