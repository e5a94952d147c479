#!/usr/bin/env python
"""End-to-end serving demo: trained checkpoint -> user features ->
full-catalog top-K.

Restores a committed TrainState (default: the loan_fund DR seed-3
checkpoint the sampler experiment also uses), takes the first --batch
users of the test CSV, runs the backbone feature pass
(serve.user_representations) and retrieves each user's top-K items over
the FULL item catalog per domain (serve.full_catalog_topk — tiled
approx_max_k + exact merge). Prints a few example recommendation lists
and the wall time per stage. Works on CPU (small batch) or the chip.

Usage: python tools/serve_demo.py [--batch 8] [--k 10] [--ckpt DIR]

NB the top of the full-pool ranking is popularity-dominated (the heads of
different users' lists overlap heavily at small k) — expected for models
trained/evaluated under the sampled-negative protocol (999 negatives),
where beating a popular-item prior over the whole catalog is not the
training objective; personalization shows in the tail and in the
sampled-negative metrics (BASELINE.md tables).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--ckpt", type=str,
                    default="results/loan_fund_dr_s34/checkpoint/seed3")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from amid_tpu.config import DataConfig, ModelConfig, TrainConfig
    from amid_tpu.data.packed import load_dual_domain_csv
    from amid_tpu.models.amid import build_model
    from amid_tpu.serve import full_catalog_topk, user_representations
    from amid_tpu.train.checkpoint import CheckpointManager
    from amid_tpu.train.loop import _sample_batch
    from amid_tpu.train.steps import init_state

    # batch_size must match the TRAINED config: the InterComp message-
    # passing params are batch-shaped (reference trans_nn = Linear(b, b),
    # model_seq.py:474-497). Serve pads the user batch up to it.
    model_cfg = ModelConfig(
        backbone="sasrec", is_itc=True, ts2=0.4, is_dr=True, kernels="auto",
    )
    assert args.batch <= model_cfg.batch_size
    data_cfg = DataConfig(dataset_type="mybank", domain_type="loan_fund")
    cfg = TrainConfig(model=model_cfg, data=data_cfg)
    model = build_model(model_cfg)
    ds = load_dual_domain_csv(
        data_cfg.test_csv(), model_cfg.seq_len, model_cfg.pad_id,
        data_cfg.long_length,
    )
    t0 = time.perf_counter()
    state = init_state(
        model, cfg, optax.adam(5e-4), optax.adam(5e-6), seed=3,
        sample_batch=_sample_batch(ds, model_cfg.batch_size),
    )
    restored = CheckpointManager(args.ckpt, keep=1).restore(state)
    assert restored is not None, f"no checkpoint under {args.ckpt}"
    params = restored.params
    print(f"restored {args.ckpt} in {time.perf_counter()-t0:.1f}s",
          flush=True)

    arrays = ds.batch_arrays()
    bsz = model_cfg.batch_size
    batch = {
        "seq_d1": jnp.asarray(arrays["seq_d1"][:bsz]),
        "seq_d2": jnp.asarray(arrays["seq_d2"][:bsz]),
    }
    t0 = time.perf_counter()
    u_d1, u_d2 = user_representations(model, params, batch)
    u_d1 = u_d1[: args.batch]
    u_d2 = u_d2[: args.batch]
    np.asarray(u_d1)  # host fetch = true sync
    print(f"feature pass ({bsz}-user model batch): "
          f"{(time.perf_counter()-t0)*1e3:.0f} ms", flush=True)

    table = params["item_embedding"]
    head = {k: params["predict"][k] for k in
            ("fc1_kernel", "fc1_bias", "fc2_kernel", "fc2_bias")}
    pools = np.asarray(ds.pools)
    sizes = np.asarray(ds.pool_sizes)
    for d, (dom, u) in enumerate((("d1", u_d1), ("d2", u_d2))):
        # serve within the domain's observed item pool (the deployable
        # catalog — the shared table spans both domains' id ranges)
        pool_ids = jnp.asarray(pools[d, : sizes[d]])
        catalog = jnp.take(table, pool_ids, axis=0)
        t0 = time.perf_counter()
        scores, pos = full_catalog_topk(u, catalog, head, k=args.k)
        items_np = np.asarray(pool_ids)[np.asarray(pos)]  # true sync
        dt = time.perf_counter() - t0
        print(f"top-{args.k} over the {int(sizes[d]):,}-item {dom} catalog: "
              f"{dt*1e3:.0f} ms for {args.batch} users", flush=True)
        for i in range(min(3, args.batch)):
            hist = [int(x) for x in np.asarray(arrays[f"seq_{dom}"][i]) if
                    x != model_cfg.pad_id][-5:]
            print(f"  user {int(arrays['user'][i])} ({dom}) "
                  f"history(last5)={hist} -> top{args.k}="
                  f"{items_np[i].tolist()}", flush=True)


if __name__ == "__main__":
    main()
