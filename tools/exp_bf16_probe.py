#!/usr/bin/env python
"""Ceiling probe for bf16 activations at the bs-8192 capability point.

The point is ~95% HBM-bound (results/roofline_8192.json) and remat makes it
WORSE (59.1k -> 49.8k ex/s, bench.py --remat A/B — recompute's own traffic
exceeds the saved activations). The remaining single-chip lever is storing
activations in half the bytes. This probes the CEILING of that lever
without building the feature: time fwd+bwd with params+inputs cast to
bfloat16 inside the loss (everything downstream computes/stores bf16;
grads flow back to f32 leaves through the cast's vjp) vs the f32 baseline.
If the delta is small, a real mixed-precision mode isn't worth its
numerics risk; if large, it motivates an act_dtype feature.

Writes results/bf16_probe.json.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.bench_kernels import device_time  # noqa: E402

BS = 8192


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg, _make_batch
    from amid_tpu.models.amid import build_model
    from amid_tpu.train import losses
    from amid_tpu.train.steps import _make_labels

    cfg = _flagship_cfg(item_length=447410, batch_size=BS, seq_len=20)
    cfg.kernels = "xla"
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = _make_batch(cfg, num_neg=1, rng=rng)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, batch, train=False)[
        "params"
    ]
    dom = jnp.asarray(rng.integers(0, 2, BS, dtype=np.int32))
    labels = _make_labels(BS, 1)

    def _bump(salt):
        return jnp.where(salt < 0.0, 1, 0).astype(jnp.int32)

    def make_fwd_bwd(cast):
        def fwd_bwd(p, b_target, b_neg, s1, s2, salt):
            def loss_fn(pp):
                if cast:
                    pp = jax.tree_util.tree_map(
                        lambda x: x.astype(jnp.bfloat16)
                        if x.dtype == jnp.float32 else x,
                        pp,
                    )
                out = model.apply(
                    {"params": pp},
                    {"target": b_target + _bump(salt),
                     "neg_samples": b_neg, "seq_d1": s1 + _bump(salt),
                     "seq_d2": s2},
                    train=False,
                )
                loss = losses.masked_bce_loss(
                    out["logits_d1"].astype(jnp.float32),
                    out["logits_d2"].astype(jnp.float32), labels, dom,
                )
                if cfg.is_dr:
                    out32 = {k: v.astype(jnp.float32)
                             if hasattr(v, "astype") else v
                             for k, v in out.items()}
                    loss = loss + 0.01 * losses.dr_e_loss(out32, labels, dom)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(p)
            return jnp.stack(
                [loss]
                + [jnp.sum(g) for g in jax.tree_util.tree_leaves(grads)]
            )

        return fwd_bwd

    fargs = (params, batch["target"], batch["neg_samples"],
             batch["seq_d1"], batch["seq_d2"])
    out = {}
    for name, cast in (("f32", False), ("bf16_all", True)):
        t = device_time(make_fwd_bwd(cast), fargs, iters=10)
        out[f"fwd_bwd_{name}_ms"] = round(t * 1e3, 2)
        print(f"fwd_bwd[{name}]: {t*1e3:.2f} ms", flush=True)
    out["speedup"] = round(
        out["fwd_bwd_f32_ms"] / out["fwd_bwd_bf16_all_ms"], 3
    )
    print(f"speedup: {out['speedup']}x", flush=True)
    Path("results").mkdir(exist_ok=True)
    Path("results/bf16_probe.json").write_text(json.dumps(out, indent=1))
    print("wrote results/bf16_probe.json", flush=True)


if __name__ == "__main__":
    main()
