#!/usr/bin/env python
"""Summarize a finished multi-seed run directory into a markdown table.

Parses the per-seed best metrics from log_all.txt's aggregate block
(mean/std lines written by train.loop.aggregate_seeds).

Usage: python tools/report_results.py results/loan_account_base/
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

HEADLINE = [
    "hit_1", "hit_5", "hit_10", "ndcg_5", "ndcg_10", "mrr",
]


def parse_log_all(path: Path) -> dict[str, tuple[float, float]]:
    out = {}
    pat = re.compile(r"\] (\w+): ([0-9.]+)/([0-9.]+)\s*$")
    for line in path.read_text().splitlines():
        m = pat.search(line)
        if m:
            out[m.group(1)] = (float(m.group(2)), float(m.group(3)))
    return out


def main(run_dir: str) -> None:
    metrics = parse_log_all(Path(run_dir) / "log_all.txt")
    if not metrics:
        print(f"no aggregate metrics in {run_dir}/log_all.txt (run unfinished?)")
        return
    suffixes = sorted({k.split("_", 2)[-1] for k in metrics if k.startswith("hit_1_")})
    print(f"## {run_dir}\n")
    print("| metric | " + " | ".join(suffixes) + " |")
    print("|---|" + "---|" * len(suffixes))
    for base in HEADLINE:
        row = [base]
        for sfx in suffixes:
            v = metrics.get(f"{base}_{sfx}")
            row.append(f"{v[0]:.4f}±{v[1]:.4f}" if v else "—")
        print("| " + " | ".join(row) + " |")
    eps = metrics.get("examples_per_s")
    if eps:
        print(f"\ntraining examples/s (mean over seeds): {eps[0]:,.0f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "results/loan_account_base/")
