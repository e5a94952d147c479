"""Run the ACTUAL reference trainer (/root/reference/train_sr.py) on CPU.

VERDICT r1 item 2: every baseline number so far was self-measured amid_tpu
output; this driver executes the reference's own train()/test() functions
(train_sr.py:31-355) with its own DualDomainSeqDataset/collate_fn_enhance
(dataset_seq.py:131-281) and model_seq.py modules, with only the minimum
environment shims:

* `.cuda()` monkeypatched to a no-op on Tensor/Module (no GPU in this image;
  the reference hard-codes .cuda() at train_sr.py:44-65,459-478).
* csv_path pointed at the shipped CSVs (main hard-codes /ossfs/workspace/...,
  train_sr.py:451-455) — same construction rule, real root.
* num_workers=2 instead of 8 (2-vCPU host; worker count only affects the
  numpy RNG stream of sampled negatives, which differs per run anyway).
* the module-global `optimizer` that train() reads (train_sr.py:213) is set
  explicitly, exactly as main constructs it (train_sr.py:481).

Everything else — seeding (train_sr.py:440-443), vocab constants (:447-450),
pad_id (:451), table doubling (:456-457), model construction (:459-463),
per-epoch train/test protocol, best-metric maxing — follows main line by line.

Usage:
  python tools/run_reference_cpu.py --dataset_type amazon --domain_type \
      cloth_sport --model sasrec --epoch 5 --seeds 3 --neg_nums 199 \
      --seq_len 150 --out results/reference_cpu_cloth_sport
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import torch

REF = "/root/reference"


def patch_cuda() -> None:
    """No-op .cuda() so the reference's hard-coded device moves stay on CPU."""
    torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
    torch.nn.Module.cuda = lambda self, *a, **k: self  # type: ignore[assignment]
    torch.cuda.is_available = lambda: False  # type: ignore[assignment]

    # model_seq.py:369 passes device="cuda" to a factory fn directly.
    def _wrap_factory(fn):
        def wrapped(*a, **kw):
            if str(kw.get("device", "")).startswith("cuda"):
                kw["device"] = "cpu"
            return fn(*a, **kw)

        return wrapped

    for name in ("ones", "zeros", "empty", "full", "arange", "tensor"):
        setattr(torch, name, _wrap_factory(getattr(torch, name)))


def patch_random_sample() -> None:
    """random.sample(set, k) was removed in Python 3.11; the reference's
    negative sampler relies on it (dataset_seq.py:95-98,198-219). Reproduce
    the old behavior (population = tuple(set)) process-wide."""
    import random

    orig = random.sample

    def sample_compat(population, k, **kw):
        if isinstance(population, (set, frozenset, dict)):
            population = tuple(population)
        return orig(population, k, **kw)

    random.sample = sample_compat


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_type", default="amazon")
    p.add_argument("--domain_type", default="cloth_sport")
    p.add_argument("--model", default="sasrec")
    p.add_argument("--epoch", type=int, default=5)
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--bs", type=int, default=256)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--emb_dim", type=int, default=128)
    p.add_argument("--hid_dim", type=int, default=32)
    p.add_argument("--seq_len", type=int, default=20)
    p.add_argument("--neg_nums", type=int, default=199)
    p.add_argument("--long_length", type=int, default=7)
    p.add_argument("--overlap_ratio", type=float, default=0.25)
    p.add_argument("--isInC", action="store_true")
    p.add_argument("--isItC", action="store_true")
    p.add_argument("--ts1", type=float, default=0.5)
    p.add_argument("--ts2", type=float, default=0.5)
    p.add_argument("--alpha_l", type=int, default=3)
    p.add_argument("--num_workers", type=int, default=2)
    p.add_argument("--seed_offset", type=int, default=0,
                   help="first seed (extend an existing run without redoing "
                   "seeds; protocol seeds are 0..4, train_sr.py:439)")
    p.add_argument("--save_ckpt", action="store_true",
                   help="torch.save the final state_dict per seed (for "
                   "transplant evals — reference weights scored by amid_tpu "
                   "eval and vice versa)")
    p.add_argument("--out", default="results/reference_cpu")
    a = p.parse_args()

    os.makedirs(a.out, exist_ok=True)
    patch_cuda()
    patch_random_sample()
    torch.set_num_threads(2)
    sys.path.insert(0, REF)
    import train_sr  # noqa: E402  (the reference module, guarded main)
    from dataset_seq import DualDomainSeqDataset, collate_fn_enhance  # noqa: E402
    from model_seq import BERT4Rec, GRU4Rec, SASRec  # noqa: E402
    import torch.utils.data as tdata  # noqa: E402

    # args namespace handed to the reference train()/test() (train_sr.py:357+).
    ref_args = argparse.Namespace(
        epoch=a.epoch, bs=a.bs, lr=a.lr, emb_dim=a.emb_dim, hid_dim=a.hid_dim,
        seq_len=a.seq_len, long_length=a.long_length, neg_nums=a.neg_nums,
        alpha_l=a.alpha_l, overlap_ratio=a.overlap_ratio,
        model_dir=a.out + "/", log_file="log.txt", model=a.model,
        dataset_type=a.dataset_type, domain_type=a.domain_type,
        isInC=a.isInC, isItC=a.isItC, ts1=a.ts1, ts2=a.ts2, overlap=False,
    )

    # Vocab constants exactly as main hard-codes them (train_sr.py:447-450).
    user_length = 895510
    item_length = 447410
    pad_id = item_length + 1

    train_csv = (
        f"{REF}/{a.dataset_type}_dataset/"
        f"{a.domain_type}_train{int(a.overlap_ratio * 100)}.csv"
    )
    test_csv = f"{REF}/{a.dataset_type}_dataset/{a.domain_type}_test.csv"

    metric_names = [
        "hit_1_d1", "ndcg_1_d1", "hit_5_d1", "ndcg_5_d1", "hit_10_d1",
        "ndcg_10_d1", "mrr_d1", "hit_1_d2", "ndcg_1_d2", "hit_5_d2",
        "ndcg_5_d2", "hit_10_d2", "ndcg_10_d2", "mrr_d2",
    ]
    per_seed: list[dict[str, float]] = []

    per_seed_path = f"{a.out}/per_seed.json"
    if a.seed_offset and os.path.exists(per_seed_path):
        with open(per_seed_path) as f:
            per_seed = json.load(f)[: a.seed_offset]

    for i in range(a.seed_offset, a.seed_offset + a.seeds):
        # Seeding exactly as main (train_sr.py:440-443).
        import random as _random

        torch.manual_seed(i)
        np.random.seed(i)
        _random.seed(i)

        ref_args.log_file = f"log{i}.txt"
        datasetTrain = DualDomainSeqDataset(
            seq_len=a.seq_len, isTrain=True, neg_nums=a.neg_nums,
            long_length=a.long_length, pad_id=pad_id, csv_path=train_csv,
        )
        trainLoader = tdata.DataLoader(
            datasetTrain, batch_size=a.bs, shuffle=True,
            num_workers=a.num_workers, drop_last=True,
            collate_fn=collate_fn_enhance,
        )
        datasetVal = DualDomainSeqDataset(
            seq_len=a.seq_len, isTrain=False, neg_nums=a.neg_nums,
            long_length=a.long_length, pad_id=pad_id, csv_path=test_csv,
        )
        valLoader = tdata.DataLoader(
            datasetVal, batch_size=a.bs, shuffle=False,
            num_workers=a.num_workers, drop_last=True,
            collate_fn=collate_fn_enhance,
        )
        # Table doubling "for pad id" (train_sr.py:456-457).
        kw = dict(
            user_length=user_length * 2, user_emb_dim=a.emb_dim,
            item_length=item_length * 2, item_emb_dim=a.emb_dim,
            seq_len=a.seq_len, hid_dim=a.hid_dim, bs=a.bs,
            isInC=a.isInC, isItC=a.isItC, threshold1=a.ts1, threshold2=a.ts2,
        )
        name = a.model.lower()
        model = {"gru4rec": GRU4Rec, "sasrec": SASRec, "bert4rec": BERT4Rec}[
            name
        ](**kw).cuda()

        # train() reads the module-global optimizer (train_sr.py:213,481).
        train_sr.optimizer = torch.optim.Adam(model.parameters(), lr=a.lr)
        train_sr.init_logger(ref_args.model_dir, ref_args.log_file)
        train_sr.logger.info(vars(ref_args))

        t0 = time.time()
        best = train_sr.train(model, trainLoader, ref_args, valLoader)
        dt = time.time() - t0
        # train() returns 12 best metrics in fixed order (train_sr.py:352-355):
        # hit1,hit5,hit10,ndcg5,ndcg10,mrr for d1 then d2.
        order = [
            "hit_1_d1", "hit_5_d1", "hit_10_d1", "ndcg_5_d1", "ndcg_10_d1",
            "mrr_d1", "hit_1_d2", "hit_5_d2", "hit_10_d2", "ndcg_5_d2",
            "ndcg_10_d2", "mrr_d2",
        ]
        row = {k: float(v) for k, v in zip(order, best)}
        row["wall_s"] = dt
        per_seed.append(row)
        print(f"seed {i}: {json.dumps(row)}", flush=True)
        with open(per_seed_path, "w") as f:
            json.dump(per_seed, f, indent=2)
        if a.save_ckpt:
            torch.save(model.state_dict(), f"{a.out}/model_seed{i}.pt")

    agg = {
        k: {
            "mean": float(np.mean([d[k] for d in per_seed])),
            "std": float(np.std([d[k] for d in per_seed])),
        }
        for k in per_seed[0]
        if k in metric_names or k.startswith(("hit", "ndcg", "mrr"))
    }
    summary = {"config": vars(a), "per_seed": per_seed, "aggregate": agg}
    with open(f"{a.out}/summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(agg, indent=2))


if __name__ == "__main__":
    main()
