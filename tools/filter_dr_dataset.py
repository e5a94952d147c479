#!/usr/bin/env python
"""DR-split generator — equivalent of amazon_dataset/filter_DR_dataset.py.

From a *_train100 CSV, produces *_train{RATIO}_DR.csv: every overlap row plus
a sampled `ratio` fraction of non-overlap rows get ob_label=1 (observed); the
remaining non-overlap rows are kept with ob_label=0
(filter_DR_dataset.py:11-64).

Also supports --drop-unobserved to emit the non-DR *_train{RATIO}.csv variant
(the notebook's split that drops unselected non-overlap rows — SURVEY.md §2.4).

Usage:
    python tools/filter_dr_dataset.py IN_train100.csv OUT_prefix --ratios 0.25 0.75
"""

from __future__ import annotations

import argparse
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from amid_tpu.data.packed import read_dual_domain_csv  # noqa: E402


def write_csv(path, users, s1, s2, dom, ob=None):
    with open(path, "w") as f:
        cols = "user_id,seq_d1,seq_d2,domain_id"
        f.write(cols + (",ob_label\n" if ob is not None else "\n"))
        for i in range(len(users)):
            row = f'{users[i]},"{s1[i]}","{s2[i]}",{dom[i]}'
            if ob is not None:
                row += f",{ob[i]}"
            f.write(row + "\n")


def select_overlap_user(src, out_path, ratio, seed=0, drop_unobserved=False):
    users, s1, s2, dom, _ = read_dual_domain_csv(src)
    ov_idx = [i for i in range(len(users)) if len(s1[i]) and len(s2[i])]
    no_idx = [i for i in range(len(users)) if not (len(s1[i]) and len(s2[i]))]
    rng = random.Random(seed)
    selected = set(rng.sample(no_idx, int(len(no_idx) * ratio)))

    order, ob = [], []
    for i in ov_idx:
        order.append(i)
        ob.append(1)
    for i in no_idx:
        if i in selected:
            order.append(i)
            ob.append(1)
    for i in no_idx:
        if i not in selected:
            if drop_unobserved:
                continue
            order.append(i)
            ob.append(0)

    write_csv(
        out_path,
        [users[i] for i in order],
        [s1[i] for i in order],
        [s2[i] for i in order],
        [dom[i] for i in order],
        None if drop_unobserved else ob,
    )
    print(f"{out_path}: {len(order)} rows ({len(ov_idx)} overlap, "
          f"{len(selected)} observed non-overlap)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("out_prefix")
    ap.add_argument("--ratios", type=float, nargs="+", default=[0.25, 0.75])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--drop-unobserved", action="store_true")
    a = ap.parse_args()
    for r in a.ratios:
        suffix = f"train{int(r * 100)}" + ("" if a.drop_unobserved else "_DR")
        select_overlap_user(
            a.src, f"{a.out_prefix}_{suffix}.csv", r, a.seed, a.drop_unobserved
        )
