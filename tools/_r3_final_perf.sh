#!/bin/sh
# Final quiet-host perf pass: gated on BOTH the chip queue finishing AND the
# reference DR CPU run exiting (host-driven step timings are garbage under
# load — CLAUDE.md). Re-runs every host-sensitive measurement.
while [ ! -f /root/repo/results/_r3_chip_queue.done ]; do sleep 60; done
while pgrep -f run_reference_cpu_dr >/dev/null 2>&1; do sleep 120; done
cd /root/repo

# serve (device-loop, but re-run clean for the record)
timeout 1800 python tools/bench_serve.py > results/serve_bench.out 2>&1

# full perf_pass (steps incl. the new eval row, breakdown, lazy, hlo)
timeout 3600 python tools/perf_pass.py > results/perf_pass_r3.out 2>&1

# fused 3-array scatter A/B (kernels=pallas lazy step)
{
  echo "three-call pallas (shipping):"
  timeout 1200 python bench.py --seq_len 20 --kernels pallas 2>&1 | tail -1
  echo "fused scatter3:"
  timeout 1200 python bench.py --seq_len 20 --kernels pallas --fused_scatter 2>&1 | tail -1
  echo "fused scatter3 phase_b:"
  timeout 1200 python bench.py --seq_len 20 --kernels pallas --phase_b --fused_scatter 2>&1 | tail -1
} > results/bench_fused_scatter.out 2>&1

# batch-size capability sweep
{
  for B in 512 1024 2048; do
    echo "batch=$B:"
    timeout 1800 python bench.py --seq_len 20 --batch $B 2>&1 | tail -1
  done
} > results/bench_batch_sweep.out 2>&1

# precision study
{
  echo "seq20 highest:"
  timeout 1800 python bench.py --seq_len 20 --matmul_precision highest 2>&1 | tail -1
  echo "seq150 xla highest:"
  timeout 2400 python bench.py --seq_len 150 --kernels xla --matmul_precision highest 2>&1 | tail -1
  echo "seq150 xla default:"
  timeout 2400 python bench.py --seq_len 150 --kernels xla 2>&1 | tail -1
} > results/bench_precision.out 2>&1

# single-chip items sweep, clean numbers
timeout 3600 python tools/bench_scaling.py \
  --items-sweep 894820,2000000,4000000,6000000 --batch 256 \
  --out results/scaling_chip.json > results/scaling_chip.out 2>&1

echo done > results/_r3_final_perf.done
