#!/usr/bin/env python
"""Measure the serving path on the real chip (VERDICT r2 missing #4).

serve.py's docstring claimed ~10-20 ms/batch for full-catalog top-K at
mybank scale as an *estimate*; this measures it: the tiled
`full_catalog_topk` over the flagship item table (894,820 rows x 128,
the run.sh vocab — train_sr.py:447-457) for a 256-user batch, per domain,
across tile sizes, plus the backbone feature pass (`user_representations`)
that precedes it. RTT-corrected device-loop timing (tools/bench_kernels.py).

Writes results/serve_bench.json and prints one line per config.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from tools.bench_kernels import V5E_HBM_GBS, device_time, tunnel_rtt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--tiles", type=str, default="4096,8192,16384")
    ap.add_argument("--out", type=str, default="results/serve_bench.json")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg, _make_batch
    from amid_tpu.models.amid import build_model
    from amid_tpu.serve import full_catalog_topk, user_representations

    cfg = _flagship_cfg(item_length=447410, batch_size=a.batch, seq_len=20)
    cfg.kernels = "xla"
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = _make_batch(cfg, num_neg=1, rng=rng)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, batch, train=False)[
        "params"
    ]
    v, d = params["item_embedding"].shape
    h = cfg.hid_dim
    print(f"tunnel RTT: {tunnel_rtt()*1e3:.1f} ms | catalog {v:,} x {d}",
          flush=True)

    # head params in serve.py's layout, from the trained head's shapes
    hp = {
        "fc1_kernel": jnp.asarray(
            rng.normal(size=(2 * d, h)).astype(np.float32) * 0.05),
        "fc1_bias": jnp.zeros((h,), jnp.float32),
        "fc2_kernel": jnp.asarray(
            rng.normal(size=(h, 1)).astype(np.float32) * 0.05),
        "fc2_bias": jnp.zeros((1,), jnp.float32),
    }
    table = params["item_embedding"]
    user = jnp.asarray(rng.normal(size=(a.batch, d)).astype(np.float32))

    # FLOPs per top-K call: item-side [V,D]@[D,H], the fused [B,V,H] add+relu
    # (counted as 1 op/elem), and the [B,V,H]@[H,1] reduction.
    flops = 2 * v * d * h + a.batch * v * h + 2 * a.batch * v * h

    res = {"batch": a.batch, "k": a.k, "catalog": int(v), "emb_dim": int(d),
           "topk": {}}
    for method in ("approx", "exact"):
        for tile in (int(t) for t in a.tiles.split(",")):
            def f(user, table, salt, _tile=tile, _m=method):
                s, i = full_catalog_topk(
                    user + 0.0 * salt, table, hp, k=a.k, tile=_tile,
                    method=_m)
                return s.sum() + i.sum()

            t = device_time(f, (user, table), iters=20)
            res["topk"][f"{method}_{tile}"] = {
                "ms_per_batch": t * 1e3,
                "tflops": flops / t / 1e12,
                "table_read_gbs": v * d * 4 / t / 1e9,
            }
            print(f"topk {method} tile={tile}: {t*1e3:.2f} ms/batch "
                  f"({flops/t/1e12:.1f} TFLOP/s, "
                  f"table read {v*d*4/t/1e9:.0f} GB/s)", flush=True)

    # on-chip recall of the shipping approx path vs the exact path
    es, ei = full_catalog_topk(user, table, hp, k=a.k, method="exact")
    as_, ai = full_catalog_topk(user, table, hp, k=a.k, method="approx")
    ei_np, ai_np = np.asarray(ei), np.asarray(ai)
    recall = float(np.mean([
        len(set(ai_np[i]) & set(ei_np[i])) / a.k for i in range(a.batch)
    ]))
    res["approx_recall_vs_exact"] = recall
    print(f"approx recall vs exact: {recall:.4f}", flush=True)

    # backbone feature pass (shared by both domains' retrievals)
    def feats(params, s1, s2, salt):
        b = dict(batch)
        b["seq_d1"], b["seq_d2"] = s1 + 0 * salt.astype(jnp.int32), s2
        u1, u2 = user_representations(model, params, b)
        return u1.sum() + u2.sum()

    t = device_time(feats, (params, batch["seq_d1"], batch["seq_d2"]),
                    iters=50)
    res["features_ms_per_batch"] = t * 1e3
    print(f"user_representations: {t*1e3:.2f} ms/batch", flush=True)

    best = min(d_["ms_per_batch"] for key, d_ in res["topk"].items()
               if key.startswith("approx_"))
    res["end_to_end_both_domains_ms"] = res["features_ms_per_batch"] + 2 * best
    print(f"end-to-end (features + 2 domains @ best approx tile): "
          f"{res['end_to_end_both_domains_ms']:.2f} ms/batch", flush=True)

    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
