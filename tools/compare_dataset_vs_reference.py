"""Row-by-row comparison: amid_tpu packed arrays vs the ACTUAL reference
Dataset (VERDICT r2 missing #3 — isolate the cloth_sport d2 delta).

`DualDomainSeqDataset.__getitem__` (dataset_seq.py:177-250) is deterministic
given a row EXCEPT for the sampled negatives; the sampling *support* (the
domain pool minus the user's raw active-domain items) is deterministic too.
This tool loads the same CSV through both stacks and asserts, for every row:

  target, domain_id, overlap_label, long_tail_mask_d1/d2, padded seq_d1/d2,
  and the exact negative-sampling support set.

Any mismatch would be a systematic data bug (the kind that could push one
domain's metrics down); zero mismatches pins the delta on the stochastic
sampling streams.

Usage:
  python tools/compare_dataset_vs_reference.py \
      --csv /root/reference/amazon_dataset/cloth_sport_test.csv --seq_len 150
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

REF = "/root/reference"


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--csv", required=True)
    p.add_argument("--seq_len", type=int, default=150)
    p.add_argument("--long_length", type=int, default=7)
    p.add_argument("--out", default=None, help="write a JSON verdict here")
    a = p.parse_args()

    sys.path.insert(0, REF)
    sys.path.insert(0, "/root/repo")
    from tools.run_reference_cpu import patch_random_sample

    patch_random_sample()
    from dataset_seq import DualDomainSeqDataset  # reference

    from amid_tpu.config import REF_ITEM_LENGTH
    from amid_tpu.data.packed import load_dual_domain_csv

    pad_id = REF_ITEM_LENGTH + 1  # train_sr.py:451
    ref = DualDomainSeqDataset(
        seq_len=a.seq_len, isTrain=True, neg_nums=1,
        long_length=a.long_length, pad_id=pad_id, csv_path=a.csv,
    )
    ours = load_dual_domain_csv(a.csv, a.seq_len, pad_id, a.long_length)

    n = len(ref)
    assert len(ours) == n, f"row count {len(ours)} != {n}"

    # Reconstruct our per-row support sets from reject positions.
    pools = [ours.pools[d][: ours.pool_sizes[d]] for d in (0, 1)]
    pool_sets = [set(int(x) for x in p) for p in pools]

    mism = {k: 0 for k in (
        "target", "domain", "overlap", "long1", "long2", "seq1", "seq2",
        "support",
    )}
    first_bad = None
    for i in range(n):
        s = ref[i]
        d = int(s["domain_id"][0])
        ok = True
        if int(s["i_node"][0]) != int(ours.target[i]):
            mism["target"] += 1; ok = False
        if d != int(ours.domain_id[i]):
            mism["domain"] += 1; ok = False
        if int(s["overlap_label"][0]) != int(ours.overlap[i]):
            mism["overlap"] += 1; ok = False
        if int(s["long_tail_mask_d1"][0]) != int(ours.long_mask_d1[i]):
            mism["long1"] += 1; ok = False
        if int(s["long_tail_mask_d2"][0]) != int(ours.long_mask_d2[i]):
            mism["long2"] += 1; ok = False
        if not np.array_equal(
            np.asarray(s["seq_d1"][0], np.int64), ours.seq_d1[i].astype(np.int64)
        ):
            mism["seq1"] += 1; ok = False
        if not np.array_equal(
            np.asarray(s["seq_d2"][0], np.int64), ours.seq_d2[i].astype(np.int64)
        ):
            mism["seq2"] += 1; ok = False
        # Reference support = pool - set(raw active seq) (dataset_seq.py:188).
        raw = json.loads((ref.seq_d1 if d == 0 else ref.seq_d2)[i])
        ref_support = (ref.item_pool_d1 if d == 0 else ref.item_pool_d2) - set(raw)
        rj = ours.reject[i][: ours.reject_counts[i]]
        our_support = pool_sets[d] - {int(pools[d][j]) for j in rj}
        if ref_support != our_support:
            mism["support"] += 1; ok = False
        if not ok and first_bad is None:
            first_bad = i

    verdict = {
        "csv": a.csv, "rows": n, "seq_len": a.seq_len,
        "mismatches": mism, "first_bad_row": first_bad,
        "equal": all(v == 0 for v in mism.values()),
    }
    print(json.dumps(verdict, indent=2))
    if a.out:
        with open(a.out, "w") as f:
            json.dump(verdict, f, indent=2)
    sys.exit(0 if verdict["equal"] else 1)


if __name__ == "__main__":
    main()
