"""amid-side DR A/B twin with FULL per-phase eval dumps (REFERENCE_PARITY
§D): the run.sh loan_fund DR config at the reference-side A/B horizon
(1 epoch x 2 seeds, 999 negs — mirror of tools/run_reference_cpu_dr.py),
recording the COMPLETE metric dict after phase A and after phase B via the
run_seed epoch_hook (train_sr_dr.py evals at :232 post-A and :406 post-B).

Usage: python tools/dump_dr_evals.py --out results/amid_ab_loan_fund_dr_v2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--seeds", type=int, default=2)
    p.add_argument("--seed_offset", type=int, default=0)
    p.add_argument("--neg_nums", type=int, default=999)
    p.add_argument("--out", default="results/amid_ab_loan_fund_dr_v2")
    a = p.parse_args()
    os.makedirs(a.out, exist_ok=True)

    from amid_tpu.config import (
        REF_ITEM_LENGTH,
        REF_USER_LENGTH,
        DataConfig,
        ModelConfig,
        TrainConfig,
    )
    from amid_tpu.data.packed import load_dual_domain_csv
    from amid_tpu.train.loop import run_seed
    from amid_tpu.utils.logging import init_logger

    pad_id = REF_ITEM_LENGTH + 1
    mc = ModelConfig(
        backbone="sasrec", seq_len=20, item_length=REF_ITEM_LENGTH,
        user_length=REF_USER_LENGTH, is_dr=True, is_itc=True, ts2=0.4,
    )
    cfg = TrainConfig(
        model=mc,
        data=DataConfig(dataset_type="mybank", domain_type="loan_fund",
                        seq_len=20, neg_nums=a.neg_nums),
        epochs=a.epochs, seeds=a.seeds, lr2=0.01, dr_e_w=0.01,
        model_dir=a.out + "/", checkpoint=False,
    )
    train_ds = load_dual_domain_csv(cfg.data.train_csv(), 20, pad_id)
    val_ds = load_dual_domain_csv(cfg.data.test_csv(), 20, pad_id)
    dr_ds = load_dual_domain_csv(cfg.data.train_dr_csv(), 20, pad_id,
                                 with_ob_label=True)

    all_rows = {}
    for seed in range(a.seed_offset, a.seed_offset + a.seeds):
        rows = []

        def hook(epoch, state, ev, phase="main"):
            rows.append({"epoch": epoch, "phase": phase,
                         "metrics": {k: float(v) for k, v in ev.items()}})

        log = init_logger(cfg.model_dir, f"log{seed}.txt")
        best = run_seed(cfg, seed, train_ds, val_ds, dr_ds=dr_ds, log=log,
                        epoch_hook=hook)
        all_rows[seed] = {"evals": rows,
                          "best": {k: float(v) for k, v in best.items()}}
        with open(f"{a.out}/per_phase.json", "w") as f:
            json.dump(all_rows, f, indent=2)
        print(f"seed {seed}: "
              + " | ".join(
                  f"{r['phase']} HR@10 d1={r['metrics']['hit_10_d1']:.4f} "
                  f"d2={r['metrics']['hit_10_d2']:.4f}"
                  for r in rows), flush=True)


if __name__ == "__main__":
    main()
