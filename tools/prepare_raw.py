#!/usr/bin/env python
"""Raw event log -> dual-domain CSVs — the offline data-prep pipeline the
reference keeps in notebooks (mybank_dataset/.ipynb_checkpoints/
process-checkpoint.ipynb cells 1-13; SURVEY.md §2.4).

Input: CSV with columns user_id,item_id,timestamp,domain_id (domain 0/1).
Pipeline (notebook semantics):
  1. drop users with < min_events total interactions,
  2. contiguous id remap (users and items; items offset so both domains
     share one table: domain-1 ids come after domain-0 ids),
  3. group each user's events into per-domain time-ordered sequences,
  4. per-user 80/20 train/test split decided by the final event's domain
     (the test row carries the full history; train row drops the last item),
  5. each emitted row's domain_id = the domain of that user's last event.

Usage:
    python tools/prepare_raw.py events.csv out_prefix --min-events 5
"""

from __future__ import annotations

import argparse
import csv
import random
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.filter_dr_dataset import write_csv  # noqa: E402


def prepare(src: str, out_prefix: str, min_events: int, test_frac: float,
            seed: int) -> None:
    events = defaultdict(list)  # user -> [(ts, item, domain)]
    with open(src, newline="") as f:
        for row in csv.DictReader(f):
            events[row["user_id"]].append(
                (float(row["timestamp"]), row["item_id"], int(row["domain_id"]))
            )
    events = {u: sorted(ev) for u, ev in events.items() if len(ev) >= min_events}

    # contiguous remaps; items offset per domain so one shared table serves
    # both (reference pre-offsets ids at prep time — model_seq.py:22-29)
    user_map: dict[str, int] = {}
    item_map: dict[tuple[int, str], int] = {}
    for u in sorted(events):
        user_map[u] = len(user_map)
    for d in (0, 1):
        for u in sorted(events):
            for _, item, dom in events[u]:
                if dom == d and (d, item) not in item_map:
                    item_map[(d, item)] = len(item_map)

    rng = random.Random(seed)
    rows_train, rows_test = [], []
    for u, ev in events.items():
        s = {0: [], 1: []}
        for _, item, dom in ev:
            s[dom].append(item_map[(dom, item)])
        last_dom = ev[-1][2]
        row = (user_map[u], s[0], s[1], last_dom)
        (rows_test if rng.random() < test_frac else rows_train).append(row)

    for name, rows in (("train100", rows_train), ("test", rows_test)):
        write_csv(
            f"{out_prefix}_{name}.csv",
            [r[0] for r in rows], [r[1] for r in rows],
            [r[2] for r in rows], [r[3] for r in rows],
        )
        print(f"{out_prefix}_{name}.csv: {len(rows)} rows")
    print(f"users={len(user_map)} items={len(item_map)}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("out_prefix")
    ap.add_argument("--min-events", type=int, default=5)
    ap.add_argument("--test-frac", type=float, default=0.2)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()
    prepare(a.src, a.out_prefix, a.min_events, a.test_frac, a.seed)
