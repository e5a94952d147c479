#!/bin/sh
# Third capability contender: lazy unique-row optimizer with XLA scatters
# (no per-row DMA floor — XLA lowers scatter to full-table-shaped updates,
# fixed cost like dense but touching only the moment rows lazily). At bs
# 256 the pallas per-row path won (48.3k vs 35.1k); the floor argument
# reverses at large batch, so measure where.
while [ ! -f /root/repo/results/_q_dense_sweep.done ]; do sleep 60; done
cd /root/repo
{
  for B in 2048 8192; do
    echo "batch=$B lazy kernels=xla device_loop:"
    timeout 2400 python bench.py --seq_len 20 --batch $B --kernels xla 2>&1 | tail -1
  done
} > results/bench_xla_scatter_sweep.out 2>&1
echo done > results/_q_xla_scatter_sweep.done
