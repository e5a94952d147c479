#!/bin/sh
# Dense-vs-lazy optimizer A/B at capability batch sizes. The r3/r4 lazy
# sweep measured throughput FALLING with batch (49.6k @512 -> 40.0k @2048,
# results/bench_batch_sweep.out): the lazy path's per-row scatter DMA floor
# (~310 ns/row, PERF.md scatter study) scales with touched rows ~ batch, so
# nothing amortizes. Dense Adam's full-table cost is FIXED (~2.75 GB/step
# HBM), so it must win beyond some batch — this sweep finds the crossover
# that large-batch configs should dispatch to.
while [ ! -f /root/repo/results/_q_batch_big.done ]; do sleep 60; done
cd /root/repo
{
  for B in 1024 2048 4096 8192; do
    echo "batch=$B dense device_loop:"
    timeout 2400 python bench.py --seq_len 20 --batch $B --dense 2>&1 | tail -1
  done
} > results/bench_dense_sweep.out 2>&1
echo done > results/_q_dense_sweep.done
