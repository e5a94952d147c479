#!/bin/sh
# Batch-size capability sweep (device-loop) — the remaining lazy-step lever
# per docs/PERF.md (bs 256 underfills the MXU; protocol number stays 256).
while [ ! -f /root/repo/results/_q_take3.done ]; do sleep 60; done
cd /root/repo
{
  for B in 512 1024 2048; do
    echo "batch=$B device_loop:"
    timeout 1800 python bench.py --seq_len 20 --batch $B 2>&1 | tail -1
  done
} > results/bench_batch_sweep.out 2>&1
echo done > results/_q_batch_sweep.done
