#!/usr/bin/env python
"""Empirically bound the sampler's with-replacement deviation
(VERDICT r4 weak #6; data/sampler.py:21-25).

The reference draws eval negatives via `random.sample` (WITHOUT
replacement, dataset_seq.py:197-203); the device sampler draws i.i.d.
(WITH replacement). The analytic claim is ~2% duplicate draws at 999 negs
from >=20k-item valid sets, distribution-level effect only. This scores the
SAME trained weights (the committed loan_fund DR seed-3 checkpoint, the
canonical 999-neg protocol config) over the full test split with

  A. the shipping device sampler (i.i.d.), 3 rng keys
  B. exact without-replacement host draws (numpy choice replace=False from
     each row's pool-minus-user-items valid set), 3 rng seeds

and reports per-metric means, scheme stds (the draw noise), and the A-B
delta. Writes results/sampler_wr.json; data/sampler.py cites it.

Run on the chip (eval passes) — host draws are cheap.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CKPT = "results/loan_fund_dr_s34/checkpoint/seed3"


def build_everything():
    import jax
    import optax

    from amid_tpu.config import DataConfig, ModelConfig, TrainConfig
    from amid_tpu.data.packed import load_dual_domain_csv
    from amid_tpu.models.amid import build_model
    from amid_tpu.train.checkpoint import CheckpointManager
    from amid_tpu.train.loop import _device_pools, _sample_batch
    from amid_tpu.train.steps import init_state

    model_cfg = ModelConfig(
        backbone="sasrec", is_itc=True, ts2=0.4, is_dr=True, kernels="auto",
    )
    data_cfg = DataConfig(
        dataset_type="mybank", domain_type="loan_fund", neg_nums=999
    )
    cfg = TrainConfig(model=model_cfg, data=data_cfg, overlap_eval=True)
    model = build_model(model_cfg)
    val_ds = load_dual_domain_csv(
        data_cfg.test_csv(), model_cfg.seq_len, model_cfg.pad_id,
        data_cfg.long_length,
    )
    # restore the trained params (full-payload template needs both opts)
    train_ds = val_ds  # only used for init shapes
    tx, tx2 = optax.adam(5e-4), optax.adam(5e-6)
    state = init_state(
        model, cfg, tx, tx2, seed=3,
        sample_batch=_sample_batch(train_ds, model_cfg.batch_size),
    )
    mgr = CheckpointManager(CKPT, keep=1)
    restored = mgr.restore(state)
    assert restored is not None, f"no checkpoint under {CKPT}"
    mgr.close()
    pools, pool_sizes = _device_pools(val_ds)
    return cfg, model, val_ds, restored.params, pools, pool_sizes


def wor_negatives(val_ds, rng: np.random.Generator, num_neg: int) -> np.ndarray:
    """Exact random.sample semantics: per row, uniform WITHOUT replacement
    from pool[domain] minus the user's items in that domain."""
    arrays = val_ds.batch_arrays()
    pools = np.asarray(val_ds.pools)
    sizes = np.asarray(val_ds.pool_sizes)
    dom = arrays["domain_id"]
    rej = arrays["reject"]
    cnt = arrays["reject_counts"] if "reject_counts" in arrays else (
        (rej < pools.shape[1]).sum(axis=1)
    )
    n = len(dom)
    out = np.empty((n, num_neg), np.int32)
    for i in range(n):
        d = dom[i]
        pool = pools[d, : sizes[d]]
        valid = np.delete(pool, rej[i, : cnt[i]])
        out[i] = rng.choice(valid, size=num_neg, replace=False)
    return out


def run_eval(model, cfg, val_ds, params, pools, pool_sizes, neg_override,
             key_seed):
    """One full eval pass; neg_override [n, K] host array or None (device
    i.i.d. sampler, the shipping path)."""
    import functools

    import jax
    import jax.numpy as jnp

    from amid_tpu.data.loader import BatchIterator
    from amid_tpu.data.sampler import sample_negatives
    from amid_tpu.train import losses
    from amid_tpu.train.metrics import RankAccumulator, positive_ranks
    from amid_tpu.train.steps import _make_labels, _model_batch

    num_neg = cfg.data.neg_nums
    bs = cfg.model.batch_size

    @functools.partial(jax.jit, static_argnames=("use_given",))
    def eval_step(params, batch, pools, pool_sizes, key, given,
                  use_given=False):
        if use_given:
            neg = given
        else:
            neg = sample_negatives(
                key, pools, pool_sizes, batch["domain_id"], batch["reject"],
                num_neg, batch.get("reject_counts"),
            )
        labels = _make_labels(batch["target"].shape[0], num_neg)
        out = model.apply(
            {"params": params}, _model_batch(batch, neg), train=False
        )
        loss_cls = losses.masked_bce_loss(
            out["logits_d1"], out["logits_d2"], labels, batch["domain_id"]
        )
        dom = batch["domain_id"][:, None]
        pred = jnp.where(dom == 0, out["logits_d1"], out["logits_d2"])
        return {
            "loss_cls": loss_cls,
            "ranks_fixed": positive_ranks(pred, fix=True),
            "ranks_raw": positive_ranks(pred, fix=False),
        }

    it = BatchIterator(val_ds, bs, shuffle=False, drop_last=True)
    acc = RankAccumulator(True)
    key = jax.random.PRNGKey(key_seed)
    dummy = jnp.zeros((bs, num_neg), jnp.int32)
    for i, batch in enumerate(it):
        if neg_override is not None:
            given = jnp.asarray(neg_override[i * bs : (i + 1) * bs])
        else:
            given = dummy
        out = eval_step(
            params, batch, pools, pool_sizes, jax.random.fold_in(key, i),
            given, use_given=neg_override is not None,
        )
        acc.add(out["ranks_fixed"], out["ranks_raw"], batch["domain_id"],
                batch["overlap"])
    return acc.finalize()


def main() -> None:
    cfg, model, val_ds, params, pools, pool_sizes = build_everything()
    runs = {"iid": [], "wor": []}
    for s in range(3):
        m = run_eval(model, cfg, val_ds, params, pools, pool_sizes, None,
                     key_seed=1000 + s)
        runs["iid"].append(m)
        print(f"iid[{s}]: hit_10_d1={m['hit_10_d1']:.4f} "
              f"hit_10_d2={m['hit_10_d2']:.4f} mrr_d1={m['mrr_d1']:.4f}",
              flush=True)
    for s in range(3):
        neg = wor_negatives(val_ds, np.random.default_rng(2000 + s),
                            cfg.data.neg_nums)
        m = run_eval(model, cfg, val_ds, params, pools, pool_sizes, neg,
                     key_seed=0)
        runs["wor"].append(m)
        print(f"wor[{s}]: hit_10_d1={m['hit_10_d1']:.4f} "
              f"hit_10_d2={m['hit_10_d2']:.4f} mrr_d1={m['mrr_d1']:.4f}",
              flush=True)

    keys = sorted(
        k for k in runs["iid"][0]
        if k.startswith(("hit_", "ndcg_", "mrr"))
    )
    summary = {}
    for k in keys:
        a = np.array([m[k] for m in runs["iid"]])
        b = np.array([m[k] for m in runs["wor"]])
        summary[k] = {
            "iid_mean": float(a.mean()), "iid_std": float(a.std()),
            "wor_mean": float(b.mean()), "wor_std": float(b.std()),
            "delta": float(a.mean() - b.mean()),
        }
    worst = max(
        summary, key=lambda k: abs(summary[k]["delta"])
        / max(summary[k]["iid_std"] + summary[k]["wor_std"], 1e-9)
    )
    print("worst delta/noise:", worst, summary[worst], flush=True)
    Path("results").mkdir(exist_ok=True)
    Path("results/sampler_wr.json").write_text(
        json.dumps({"summary": summary, "per_run": {
            k: [{m2: float(v2) for m2, v2 in m.items()} for m in v]
            for k, v in runs.items()
        }}, indent=1)
    )
    print("wrote results/sampler_wr.json", flush=True)


if __name__ == "__main__":
    main()
