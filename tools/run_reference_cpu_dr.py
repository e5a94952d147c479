"""Run the ACTUAL reference DR trainer (/root/reference/train_sr_dr.py) on CPU.

VERDICT r2 missing #1(b): the doubly-robust trainer — the paper's headline
schedule (run.sh:1) — had never been executed from the reference side. This
driver runs the reference's own two-phase train() (train_sr_dr.py:130-538:
phase A = masked BCE + dr_e_w*dr_e on the main loader, optimizer; eval;
phase B = dr_r on the DR loader, optimizer2; eval) with the same minimal
environment shims as tools/run_reference_cpu.py (.cuda() no-op,
py3.12 random.sample compat, real CSV roots, num_workers=2).

train() reads module globals `optimizer`/`optimizer2` (train_sr_dr.py:223,
398) which __main__ sets at train_sr_dr.py:668-669; we set them identically.
Dataset/model construction follows __main__ line by line
(train_sr_dr.py:624-669): vocab constants, pad_id=item_length+1, table
doubling, DualDomainSeqDataset (main+val) + DualDomainSeqDatasetDR
(csv *_DR.csv), drop_last everywhere, Adam(lr) + Adam(lr*lr2).

Usage (run.sh config on loan_fund, whose _DR split ships with the repo):
  python tools/run_reference_cpu_dr.py --dataset_type mybank \
      --domain_type loan_fund --model sasrec --isItC --ts2 0.4 \
      --neg_nums 999 --lr2 0.01 --dr_e_w 0.01 --epoch 1 --seeds 2 \
      --out results/reference_cpu_loan_fund_dr
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_reference_cpu import patch_cuda, patch_random_sample  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_type", default="mybank")
    p.add_argument("--domain_type", default="loan_fund")
    p.add_argument("--model", default="sasrec")
    p.add_argument("--epoch", type=int, default=1)
    p.add_argument("--seeds", type=int, default=2)
    p.add_argument("--seed_offset", type=int, default=0)
    p.add_argument("--bs", type=int, default=256)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--lr2", type=float, default=0.01)
    p.add_argument("--dr_e_w", type=float, default=0.01)
    p.add_argument("--emb_dim", type=int, default=128)
    p.add_argument("--hid_dim", type=int, default=32)
    p.add_argument("--seq_len", type=int, default=20)
    p.add_argument("--neg_nums", type=int, default=999)
    p.add_argument("--long_length", type=int, default=7)
    p.add_argument("--overlap_ratio", type=float, default=0.25)
    p.add_argument("--isInC", action="store_true")
    p.add_argument("--isItC", action="store_true")
    p.add_argument("--ts1", type=float, default=0.5)
    p.add_argument("--ts2", type=float, default=0.5)
    p.add_argument("--alpha_l", type=int, default=3)
    p.add_argument("--num_workers", type=int, default=2)
    p.add_argument("--save_ckpt", action="store_true")
    p.add_argument("--csv_root", default=REF,
                   help="root holding {dataset_type}_dataset/ (override with "
                   "a truncated copy for smoke tests)")
    p.add_argument("--out", default="results/reference_cpu_dr")
    a = p.parse_args()

    os.makedirs(a.out, exist_ok=True)
    patch_cuda()
    patch_random_sample()
    torch.set_num_threads(2)
    sys.path.insert(0, REF)
    import train_sr_dr  # noqa: E402  (the reference module, guarded main)
    from dataset_seq import (  # noqa: E402
        DualDomainSeqDataset,
        DualDomainSeqDatasetDR,
        collate_fn_enhance,
        collate_fn_enhanceDR,
    )
    from model_seq import BERT4Rec, GRU4Rec, SASRec  # noqa: E402
    import torch.utils.data as tdata  # noqa: E402

    ref_args = argparse.Namespace(
        epoch=a.epoch, bs=a.bs, lr=a.lr, lr2=a.lr2, dr_e_w=a.dr_e_w,
        emb_dim=a.emb_dim, hid_dim=a.hid_dim, seq_len=a.seq_len,
        long_length=a.long_length, neg_nums=a.neg_nums, alpha_l=a.alpha_l,
        overlap_ratio=a.overlap_ratio, model_dir=a.out + "/",
        log_file="log.txt", model=a.model, dataset_type=a.dataset_type,
        domain_type=a.domain_type, isInC=a.isInC, isItC=a.isItC, ts1=a.ts1,
        ts2=a.ts2, overlap=False, isDR=True,
    )

    # Vocab constants exactly as __main__ (train_sr_dr.py:632-635).
    user_length = 895510
    item_length = 447410
    pad_id = item_length + 1

    split = int(a.overlap_ratio * 100)
    root = a.csv_root
    train_csv = f"{root}/{a.dataset_type}_dataset/{a.domain_type}_train{split}.csv"
    dr_csv = f"{root}/{a.dataset_type}_dataset/{a.domain_type}_train{split}_DR.csv"
    test_csv = f"{root}/{a.dataset_type}_dataset/{a.domain_type}_test.csv"

    per_seed: list[dict[str, float]] = []
    per_seed_path = f"{a.out}/per_seed.json"
    if a.seed_offset and os.path.exists(per_seed_path):
        with open(per_seed_path) as f:
            per_seed = json.load(f)[: a.seed_offset]

    for i in range(a.seed_offset, a.seed_offset + a.seeds):
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
        datasetTrainDR = DualDomainSeqDatasetDR(
            seq_len=a.seq_len, isTrain=True, neg_nums=a.neg_nums,
            long_length=a.long_length, pad_id=pad_id, csv_path=dr_csv,
        )
        trainLoaderDR = tdata.DataLoader(
            datasetTrainDR, batch_size=a.bs, shuffle=True,
            num_workers=a.num_workers, drop_last=True,
            collate_fn=collate_fn_enhanceDR,
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
        kw = dict(
            user_length=user_length * 2, user_emb_dim=a.emb_dim,
            item_length=item_length * 2, item_emb_dim=a.emb_dim,
            seq_len=a.seq_len, hid_dim=a.hid_dim, bs=a.bs,
            isInC=a.isInC, isItC=a.isItC, threshold1=a.ts1,
            threshold2=a.ts2, isDR=True,
        )
        name = a.model.lower()
        model = {"gru4rec": GRU4Rec, "sasrec": SASRec, "bert4rec": BERT4Rec}[
            name
        ](**kw).cuda()

        # Two optimizers over the same params (train_sr_dr.py:668-669);
        # train() reads them as module globals (:223,398).
        train_sr_dr.optimizer = torch.optim.Adam(model.parameters(), lr=a.lr)
        train_sr_dr.optimizer2 = torch.optim.Adam(
            model.parameters(), lr=a.lr * a.lr2
        )
        train_sr_dr.init_logger(ref_args.model_dir, ref_args.log_file)
        train_sr_dr.logger.info(vars(ref_args))

        t0 = time.time()
        best = train_sr_dr.train(
            model, trainLoader, trainLoaderDR, ref_args, valLoader
        )
        dt = time.time() - t0
        # 12 best metrics, same order as train_sr (train_sr_dr.py:536).
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
        if k.startswith(("hit", "ndcg", "mrr"))
    }
    summary = {"config": vars(a), "per_seed": per_seed, "aggregate": agg}
    with open(f"{a.out}/summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(agg, indent=2))


if __name__ == "__main__":
    main()
