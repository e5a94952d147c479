#!/usr/bin/env python
"""Emit the REFERENCE_PARITY §D per-phase DR A/B tables.

Reference side: the train_sr_dr.py log written by
tools/run_reference_cpu_dr.py — each epoch logs one eval block after
phase A ("Epoch: k/N  Train Loss: ... dr_e Loss: ...") and one after
phase B ("Train dr_r Loss"), train_sr_dr.py:232/:406. The reference
logger appends ALL seeds to log0.txt (reference init_logger reuses the
root logger), so blocks are split per seed by the re-logged cfg line.

amid side: per_phase.json written by tools/dump_dr_evals.py (full metric
dict per phase per seed).

Usage: python tools/compare_dr_ab.py \
    results/reference_cpu_loan_fund_dr/log0.txt \
    results/amid_ab_loan_fund_dr_v2/per_phase.json
"""

from __future__ import annotations

import json
import re
import sys

import numpy as np

METRICS = [
    ("HR@1", "hit_1"), ("HR@5", "hit_5"), ("HR@10", "hit_10"),
    ("NDCG@5", "ndcg_5"), ("NDCG@10", "ndcg_10"), ("MRR", "mrr"),
]
# order of values inside one reference eval block, per domain
_BLOCK_KEYS = ["hit_1", "hit_5", "hit_10", "ndcg_5", "ndcg_10", "mrr"]


def parse_reference_log(path: str) -> list[list[dict]]:
    """-> per-seed list of per-eval metric dicts (phase A, phase B, ...)."""
    text = open(path).read()
    # split on the cfg json line each seed logs first
    seed_chunks = re.split(r"\[\d{4}-\d\d-\d\d [^\]]*\] \{'epoch'", text)[1:]
    out = []
    num = r"([0-9.]+)/[0-9.]+"
    block_re = re.compile(
        r"val domain1 cur/max HR@1: " + num
        + r"\s*,HR@5: " + num
        + r"\s*, HR@10: " + num
        + r"\s*NDCG@5: " + num
        + r"\s*, NDCG@10: " + num
        + r",\s*val domain1 cur/max MRR: " + num
        + r"\s*val domain2 cur/max HR@1: " + num
        + r"\s*, HR@5: " + num
        + r"\s*, HR@10: " + num
        + r"\s*NDCG@5: " + num
        + r"\s*, NDCG@10: " + num
        + r",\s*val domain2 cur/max MRR: " + num,
    )
    for chunk in seed_chunks:
        evals = []
        for m in block_re.finditer(chunk):
            vals = [float(v) for v in m.groups()]
            d = {}
            for i, k in enumerate(_BLOCK_KEYS):
                d[f"{k}_d1"] = vals[i]
                d[f"{k}_d2"] = vals[6 + i]
            evals.append(d)
        out.append(evals)
    return out


def table(title: str, ref_rows: list[dict], amid_rows: list[dict]) -> None:
    print(f"\n### {title}\n")
    print("| metric | reference (torch, CPU) | amid_tpu (TPU) | Δ |")
    print("|---|---|---|---|")
    for dom in ("d1", "d2"):
        for label, base in METRICS:
            k = f"{base}_{dom}"
            rv = np.array([r[k] for r in ref_rows if k in r])
            av = np.array([a[k] for a in amid_rows if k in a])
            if rv.size == 0 or av.size == 0:
                continue
            rm, rs = rv.mean(), rv.std()
            am, as_ = av.mean(), av.std()
            joint = max(rs, as_, 1e-9)
            delta = am - rm
            tag = ("within noise" if abs(delta) <= 2 * joint
                   else f"{delta:+.4f}")
            print(f"| {label} {dom} | {rm:.4f}±{rs:.4f} | "
                  f"{am:.4f}±{as_:.4f} | {tag} |")


def main(ref_log: str, amid_json: str) -> None:
    ref = parse_reference_log(ref_log)
    amid = json.load(open(amid_json))
    print(f"reference seeds (blocks each): {[len(s) for s in ref]}; "
          f"amid seeds: {len(amid)} — the TPU side is cheap to seed, the "
          f"CPU reference is not; means are compared over ALL runs each "
          f"side has")
    # phase A = eval 0, phase B = eval 1 (1-epoch A/B config)
    ref_a = [s[0] for s in ref if len(s) >= 1]
    ref_b = [s[1] for s in ref if len(s) >= 2]
    amid_a, amid_b = [], []
    for seed in sorted(amid, key=int):
        evs = amid[seed]["evals"]
        amid_a += [e["metrics"] for e in evs if e["phase"] == "main"]
        amid_b += [e["metrics"] for e in evs if e["phase"] == "post_dr"]
    table("post-phase-A (cls + dr_e trained)", ref_a, amid_a)
    table("post-phase-B (dr_r / optimizer2 trained)", ref_b, amid_b)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
