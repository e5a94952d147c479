#!/usr/bin/env python
"""Emit the REFERENCE_PARITY A/B markdown table for one config.

Reference side: per_seed.json written by tools/run_reference_cpu*.py
(list of best-epoch metric dicts, one per seed). amid side: the run dir's
log_all.txt aggregate block (train.loop.aggregate_seeds mean/std lines).

Usage: python tools/compare_ab.py results/reference_cpu_X/per_seed.json \
           results/amid_ab_X/
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from report_results import parse_log_all  # noqa: E402

ROWS = [
    ("HR@1", "hit_1"), ("HR@5", "hit_5"), ("HR@10", "hit_10"),
    ("NDCG@5", "ndcg_5"), ("NDCG@10", "ndcg_10"), ("MRR", "mrr"),
]


def main(ref_json: str, amid_dir: str) -> None:
    ref = json.load(open(ref_json))
    amid = parse_log_all(Path(amid_dir) / "log_all.txt")
    n = len(ref)
    print(f"reference seeds: {n}; amid aggregate: {amid_dir}\n")
    print("| metric | reference (torch, CPU) | amid_tpu (TPU) | Δ |")
    print("|---|---|---|---|")
    for dom in ("d1", "d2"):
        for label, base in ROWS:
            k = f"{base}_{dom}"
            rv = np.array([s[k] for s in ref if k in s], dtype=float)
            if rv.size == 0 or f"{k}" not in amid:
                continue
            am, astd = amid[k]
            rm, rstd = rv.mean(), rv.std()
            joint = max(rstd, astd, 1e-9)
            delta = am - rm
            tag = "within noise" if abs(delta) <= 2 * joint else f"{delta:+.4f}"
            print(f"| {label} {dom} | {rm:.4f}±{rstd:.4f} | "
                  f"{am:.4f}±{astd:.4f} | {tag} |")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
