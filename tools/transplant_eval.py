"""Transplant eval: score the SAME weights under both eval stacks
(VERDICT r2 missing #3 — settle the cloth_sport d2 delta).

Trains amid_tpu (SASRec base, cloth_sport train25) and, after every epoch,
copies the flax parameters into the ACTUAL reference torch SASRec and runs
the reference's own `test()` (train_sr.py:31-128) over its own
DualDomainSeqDataset val loader. Any *systematic* eval-protocol difference
(negative sampling with/without replacement, routing, tie-break, metric
math) shows up as a consistent offset between the two columns at identical
weights; if the columns agree, the remaining A/B delta is attributable to
the training-side stochastic streams (shuffle order, dropout, train
negatives), which are not alignable across frameworks.

Param mapping reused from tests/test_full_model_vs_reference.py (the
fwd/grad parity test pins that the mapping itself is correct).

Usage:
  python tools/transplant_eval.py --epochs 5 --seed 0 \
      --out results/transplant_cloth_sport
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = "/root/repo"
REF = "/root/reference"


def _copy_comp(tmod, cp) -> None:
    """flax InnerComp/InterComp params -> reference comp module (same
    mapping as the tests/test_comp.py real-module oracle: flax kernels are
    [in, out], torch Linear weights [out, in])."""
    import torch

    with torch.no_grad():
        tmod.trans_nn.weight.copy_(
            torch.as_tensor(np.asarray(cp["trans_nn_kernel"])).T)
        tmod.trans_nn.bias.copy_(
            torch.as_tensor(np.asarray(cp["trans_nn_bias"])))
        tmod.trans_bs.weight.copy_(
            torch.as_tensor(np.asarray(cp["trans_bs_kernel"]))[None, :])
        tmod.trans_bs.bias.copy_(
            torch.as_tensor(np.atleast_1d(np.asarray(cp["trans_bs_bias"]))))


def copy_params_to_ref(params, ref_model) -> None:
    """flax param tree -> reference torch SASRec (base or ItC+DR: the comp
    modules and the ips/gfunc heads are copied when both sides have them)."""
    import torch

    sys.path.insert(0, f"{REPO}/tests")
    from test_full_model_vs_reference import _copy_head, _copy_log2feats

    with torch.no_grad():
        ref_model.item_emb_layer.emb_item.weight.copy_(
            torch.as_tensor(np.asarray(params["item_embedding"]))
        )
    _copy_log2feats(ref_model.sac1, params["enc_d1"])
    _copy_log2feats(ref_model.sac2, params["enc_d2"])
    _copy_head(ref_model.predictModule, params["predict"])
    if getattr(ref_model, "isItC", False):
        # flax nests the comp params under the shared PeerMessage submodule
        _copy_comp(ref_model.itc_d1,
                   params["itc_d1"].get("PeerMessage_0", params["itc_d1"]))
        _copy_comp(ref_model.itc_d2,
                   params["itc_d2"].get("PeerMessage_0", params["itc_d2"]))
    if getattr(ref_model, "isDR", False):
        _copy_head(ref_model.predict_ips, params["predict_ips"])
        _copy_head(ref_model.predict_gfunc, params["predict_gfunc"])


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dataset_type", default="amazon")
    p.add_argument("--domain_type", default="cloth_sport")
    p.add_argument("--seq_len", type=int, default=150)
    p.add_argument("--neg_nums", type=int, default=199)
    p.add_argument("--dr", action="store_true",
                   help="DR config (VERDICT r3 #7): SASRec + InterComp + "
                        "6-head DR model, two-phase schedule; the reference "
                        "eval stack becomes train_sr_dr.test "
                        "(train_sr_dr.py:31-128, main head only) and the "
                        "hook fires after BOTH per-epoch evals")
    p.add_argument("--ts2", type=float, default=0.4)
    p.add_argument("--out", default="results/transplant_cloth_sport")
    a = p.parse_args()
    os.makedirs(a.out, exist_ok=True)

    import torch

    sys.path.insert(0, REPO)
    from tools.run_reference_cpu import patch_cuda, patch_random_sample

    patch_cuda()
    patch_random_sample()
    torch.set_num_threads(2)
    sys.path.insert(0, REF)
    import train_sr  # the reference module (guarded main)
    import torch.utils.data as tdata
    from dataset_seq import DualDomainSeqDataset, collate_fn_enhance
    from model_seq import SASRec as RefSASRec

    if a.dr:
        import train_sr_dr  # reference DR trainer (guarded main)

        ref_test = train_sr_dr.test  # train_sr_dr.py:31-128 (main head only)
    else:
        ref_test = train_sr.test

    import jax
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
        backbone="sasrec", seq_len=a.seq_len, item_length=REF_ITEM_LENGTH,
        user_length=REF_USER_LENGTH,
        is_dr=a.dr, is_itc=a.dr, ts2=a.ts2,
    )
    cfg = TrainConfig(
        model=mc,
        data=DataConfig(
            dataset_type=a.dataset_type, domain_type=a.domain_type,
            seq_len=a.seq_len, neg_nums=a.neg_nums,
        ),
        epochs=a.epochs, seeds=1, model_dir=a.out + "/", checkpoint=False,
    )

    train_ds = load_dual_domain_csv(cfg.data.train_csv(), a.seq_len, pad_id)
    val_ds = load_dual_domain_csv(cfg.data.test_csv(), a.seq_len, pad_id)
    dr_ds = (
        load_dual_domain_csv(cfg.data.train_dr_csv(), a.seq_len, pad_id,
                             with_ob_label=True)
        if a.dr
        else None
    )

    # Reference eval stack: its own Dataset over the same test csv
    # (train_sr.py:454-455: shuffle=False, drop_last=True).
    ref_val = DualDomainSeqDataset(
        seq_len=a.seq_len, isTrain=False, neg_nums=a.neg_nums, long_length=7,
        pad_id=pad_id, csv_path=cfg.data.test_csv(),
    )
    ref_loader = tdata.DataLoader(
        ref_val, batch_size=256, shuffle=False, num_workers=0,
        drop_last=True, collate_fn=collate_fn_enhance,
    )
    ref_model = RefSASRec(
        user_length=REF_USER_LENGTH * 2, user_emb_dim=128,
        item_length=REF_ITEM_LENGTH * 2, item_emb_dim=128,
        seq_len=a.seq_len, hid_dim=32, bs=256, isInC=False, isItC=a.dr,
        threshold1=0.5, threshold2=a.ts2, isDR=a.dr,
    )
    ref_args = argparse.Namespace(neg_nums=a.neg_nums, overlap=False)

    metric_keys = [
        "hit_1_d1", "ndcg_1_d1", "hit_5_d1", "ndcg_5_d1", "hit_10_d1",
        "ndcg_10_d1", "mrr_d1", "hit_1_d2", "ndcg_1_d2", "hit_5_d2",
        "ndcg_5_d2", "hit_10_d2", "ndcg_10_d2", "mrr_d2",
    ]
    rows = []

    def hook(epoch, state, ev, phase="main"):
        params = jax.device_get(state.params)
        copy_params_to_ref(params, ref_model)
        out = ref_test(ref_model, ref_args, ref_loader)
        # test() returns (loss, loss_cls, 7 d1 metrics, 7 d2 metrics) in
        # both trainers (train_sr.py:113-128 / train_sr_dr.py:100-128)
        ref_m = {k: float(v) for k, v in zip(metric_keys, out[2:])}
        amid_m = {k: float(ev[k]) for k in metric_keys if k in ev}
        rows.append({"epoch": epoch, "phase": phase,
                     "amid": amid_m, "ref_eval": ref_m})
        print(
            f"epoch {epoch} [{phase}]: "
            f"HR@10 d2 amid={amid_m.get('hit_10_d2', 0):.4f} "
            f"ref-eval(same weights)={ref_m['hit_10_d2']:.4f} | "
            f"MRR d2 amid={amid_m.get('mrr_d2', 0):.4f} "
            f"ref-eval={ref_m['mrr_d2']:.4f}",
            flush=True,
        )
        with open(f"{a.out}/per_epoch.json", "w") as f:
            json.dump(rows, f, indent=2)

    log = init_logger(cfg.model_dir, f"log{a.seed}.txt")
    run_seed(cfg, a.seed, train_ds, val_ds, dr_ds=dr_ds, log=log,
             epoch_hook=hook)

    # Aggregate: mean |amid - ref_eval| per metric (per phase on the DR
    # schedule — post-phase-A and post-phase-B weights are distinct points).
    summary = {}
    phases = sorted({r["phase"] for r in rows})
    for k in metric_keys:
        entry = {}
        for ph in phases:
            deltas = [r["amid"][k] - r["ref_eval"][k]
                      for r in rows if r["phase"] == ph and k in r["amid"]]
            if deltas:
                entry[ph] = {
                    "mean_delta_amid_minus_ref_eval": float(np.mean(deltas)),
                    "max_abs_delta": float(np.max(np.abs(deltas))),
                }
        summary[k] = entry if len(phases) > 1 else next(iter(entry.values()))
    with open(f"{a.out}/summary.json", "w") as f:
        json.dump({"config": vars(a), "per_epoch": rows, "delta": summary}, f,
                  indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
