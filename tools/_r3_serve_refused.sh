#!/bin/sh
# Re-measure serving after the fused score-tile rewrite (serve.py: the
# H-contraction as multiply+reduce so the [B,T,H] hidden never leaves the
# tile). Chained after take-3 so chip jobs stay serial; larger tiles added
# since fusion shifts the optimum up.
while [ ! -f /root/repo/results/_q_take3.done ]; do sleep 60; done
cd /root/repo
timeout 1800 python tools/bench_serve.py --tiles 8192,16384,65536,262144 \
  --out results/serve_bench_fused.json > results/serve_bench_fused.out 2>&1
echo done > results/_q_serve_fused.done
