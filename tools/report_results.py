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


def count_seeds(run_dir: Path) -> int:
    """Seed count for pooling weights.

    The aggregate block in log_all.txt covers exactly the LAST logged run's
    `cfg.seeds`, so parse that from the last logged cfg json — counting
    log*.txt files silently mis-weights a reused dir that still holds stale
    per-seed logs from an aborted earlier run. Warn when the two disagree.
    """
    n_logs = len([f for f in run_dir.glob("log*.txt") if f.name != "log_all.txt"])
    n_cfg = None
    try:
        for line in (run_dir / "log_all.txt").read_text().splitlines():
            m = re.search(r'"seeds": (\d+)', line)
            if m:
                n_cfg = int(m.group(1))  # keep the last one
    except OSError:
        pass
    if n_cfg is None:
        return n_logs
    if n_cfg != n_logs:
        print(
            f"WARNING: {run_dir}: logged cfg says seeds={n_cfg} but "
            f"{n_logs} per-seed logs present (stale logs from an aborted "
            f"run?) — weighting by the cfg value {n_cfg}",
            file=sys.stderr,
        )
    return n_cfg


def merge_aggregates(
    groups: list[tuple[int, dict[str, tuple[float, float]]]],
) -> dict[str, tuple[float, float]]:
    """Exactly pool per-dir (mean, std) aggregates into one.

    aggregate_seeds uses np.std with ddof=0 (population), so the pooled
    moments reconstruct the std over the union of seeds exactly:
      E[x] = sum(n_i * m_i) / N,  E[x^2] = sum(n_i * (s_i^2 + m_i^2)) / N.
    Used to extend a committed 3-seed table with a seeds 3-4 run
    (--seed_offset) into the reference's 5-seed protocol (train_sr.py:439).
    """
    keys = sorted({k for _, m in groups for k in m})
    out = {}
    for k in keys:
        have = [(n, m[k]) for n, m in groups if k in m]
        N = sum(n for n, _ in have)
        mean = sum(n * mu for n, (mu, _) in have) / N
        ex2 = sum(n * (sd * sd + mu * mu) for n, (mu, sd) in have) / N
        out[k] = (mean, float(max(ex2 - mean * mean, 0.0)) ** 0.5)
    return out


def print_table(metrics: dict[str, tuple[float, float]], title: str) -> None:
    suffixes = sorted({k.split("_", 2)[-1] for k in metrics if k.startswith("hit_1_")})
    print(f"## {title}\n")
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


def merge_main(run_dirs: list[str]) -> None:
    groups = []
    for d in run_dirs:
        p = Path(d)
        groups.append((count_seeds(p), parse_log_all(p / "log_all.txt")))
    n_total = sum(n for n, _ in groups)
    merged = merge_aggregates(groups)
    print_table(merged, f"{' + '.join(run_dirs)} (pooled, {n_total} seeds)")


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
    if len(sys.argv) > 2 and sys.argv[1] == "--merge":
        merge_main(sys.argv[2:])
    else:
        main(sys.argv[1] if len(sys.argv) > 1 else "results/loan_account_base/")
