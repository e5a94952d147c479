#!/usr/bin/env python
"""Roofline the bs-8192 dense capability point + diagnose the 4Mx8192 cliff
(VERDICT r4 weak #4/#5).

Part A — stage census at bs 8192 (the 59.1k ex/s headline): the same
incremental-program decomposition perf_pass.breakdown() runs at bs 256,
plus XLA's own cost analysis per stage (flops / bytes accessed), so each
stage gets achieved-vs-roofline attribution: % of MXU SOL (197 TF/s bf16 —
TPU DEFAULT matmul precision) and % of HBM SOL (819 GB/s). Names the
binding stage.

Part B — the 4M-row x 8192 cliff (results/scaling_bigbatch.json: 1.6k
ex/s): compile the dense step at table rows 894,820 (healthy) and 4,000,000
(cliff) and print compiled.memory_analysis() — argument/output/temp/alias
bytes — plus a census of large buffers in the optimized HLO (full-table
copies = failed donation; big fusion temps = backward materialization).
Writes results/roofline_8192.json.

Run on an idle host + chip.
"""

from __future__ import annotations

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.bench_kernels import V5E_HBM_GBS, device_time  # noqa: E402

V5E_MXU_TFS = 197.0  # bf16 (TPU DEFAULT matmul precision class)
BS = 8192


def _setup(item_length: int):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg, _make_batch
    from amid_tpu.models.amid import build_model

    cfg = _flagship_cfg(item_length=item_length, batch_size=BS, seq_len=20)
    cfg.kernels = "xla"
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = _make_batch(cfg, num_neg=1, rng=rng)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, batch, train=False)[
        "params"
    ]
    dom = jnp.asarray(rng.integers(0, 2, BS, dtype=np.int32))
    return cfg, model, batch, params, dom


def _cost(f, args) -> dict:
    """XLA's flops/bytes estimate for the compiled program."""
    import jax

    try:
        c = jax.jit(f).lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return {
            "flops": float(c.get("flops", -1.0)),
            "bytes": float(c.get("bytes accessed", -1.0)),
        }
    except Exception as e:  # tunnel backends may not expose cost analysis
        return {"error": f"{type(e).__name__}: {e}"}


def stage_census() -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from amid_tpu.train import losses
    from amid_tpu.train.steps import _make_labels

    cfg, model, batch, params, dom = _setup(447410)
    labels = _make_labels(BS, 1)

    def _bump(salt):
        return jnp.where(salt < 0.0, 1, 0).astype(jnp.int32)

    def forward(p, b_target, b_neg, s1, s2, salt):
        out = model.apply(
            {"params": p},
            {"target": b_target + _bump(salt),
             "neg_samples": b_neg, "seq_d1": s1 + _bump(salt), "seq_d2": s2},
            train=False,
        )
        return out["logits_d1"] + out["logits_d2"]

    def fwd_bwd(p, b_target, b_neg, s1, s2, salt):
        def loss_fn(pp):
            out = model.apply(
                {"params": pp},
                {"target": b_target + _bump(salt),
                 "neg_samples": b_neg, "seq_d1": s1 + _bump(salt),
                 "seq_d2": s2},
                train=False,
            )
            loss = losses.masked_bce_loss(
                out["logits_d1"], out["logits_d2"], labels, dom
            )
            if cfg.is_dr:
                loss = loss + 0.01 * losses.dr_e_loss(out, labels, dom)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(p)
        return jnp.stack(
            [loss] + [jnp.sum(g) for g in jax.tree_util.tree_leaves(grads)]
        )

    tx = optax.adam(5e-4)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(lambda x: jnp.ones_like(x) * 1e-6, params)

    def adam_step(c):
        p, os_ = c
        updates, os2 = tx.update(grads, os_, p)
        return (optax.apply_updates(p, updates), os2)

    def adam_probe(c):
        return jnp.sum(c[0]["item_embedding"][:8])

    res = {"batch_size": BS}
    fargs = (params, batch["target"], batch["neg_samples"], batch["seq_d1"],
             batch["seq_d2"])
    t = device_time(forward, fargs, iters=20)
    res["forward_ms"] = t * 1e3
    res["forward_cost"] = _cost(
        lambda *a: forward(*a, jnp.zeros(())), fargs)
    t = device_time(fwd_bwd, fargs, iters=10)
    res["fwd_bwd_ms"] = t * 1e3
    res["fwd_bwd_cost"] = _cost(
        lambda *a: fwd_bwd(*a, jnp.zeros(())), fargs)
    from tools.bench_kernels import device_time_carry

    t = device_time_carry(adam_step, (params, opt_state), adam_probe, iters=10)
    res["dense_adam_ms"] = t * 1e3
    res["backward_ms"] = res["fwd_bwd_ms"] - res["forward_ms"]

    # rooflines
    table_bytes = 894_820 * 128 * 4
    res["dense_adam_hbm_bound_ms"] = 7 * table_bytes / (V5E_HBM_GBS * 1e9) * 1e3
    res["dense_adam_hbm_pct"] = (
        100.0 * res["dense_adam_hbm_bound_ms"] / max(res["dense_adam_ms"], 1e-9)
    )
    for key_ in ("forward", "fwd_bwd"):
        c = res[f"{key_}_cost"]
        if "flops" in c and c["flops"] > 0:
            ms = res[f"{key_}_ms"]
            res[f"{key_}_mxu_pct"] = (
                100.0 * (c["flops"] / (V5E_MXU_TFS * 1e12)) / (ms / 1e3)
            )
            res[f"{key_}_hbm_pct"] = (
                100.0 * (c["bytes"] / (V5E_HBM_GBS * 1e9)) / (ms / 1e3)
            )
    for k, v in sorted(res.items()):
        print(f"A {k}: {v}", flush=True)
    return res


def _dense_step_fn(cfg, model, dom):
    import jax
    import jax.numpy as jnp
    import optax

    from amid_tpu.train import losses
    from amid_tpu.train.steps import _make_labels

    labels = _make_labels(BS, 1)
    tx = optax.adam(5e-4)

    def step(p, os_, b):
        def loss_fn(pp):
            out = model.apply({"params": pp}, b, train=False)
            return losses.masked_bce_loss(
                out["logits_d1"], out["logits_d2"], labels, dom
            )

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, os2 = tx.update(grads, os_, p)
        return optax.apply_updates(p, updates), os2, loss

    return step, tx


def memory_census(item_length: int) -> dict:
    """Compile the donated dense step; report memory analysis + HLO buffer
    census (no execution — the 4M point runs at 1.6k ex/s)."""
    import jax

    cfg, model, batch, params, dom = _setup(item_length)
    step, tx = _dense_step_fn(cfg, model, dom)
    opt_state = tx.init(params)
    b = {k: batch[k] for k in ("target", "neg_samples", "seq_d1", "seq_d2")}
    compiled = (
        jax.jit(step, donate_argnums=(0, 1)).lower(params, opt_state, b)
        .compile()
    )
    res = {"item_rows": item_length * 2}
    try:
        ma = compiled.memory_analysis()
        for name in (
            "argument_size_in_bytes", "output_size_in_bytes",
            "temp_size_in_bytes", "alias_size_in_bytes",
            "generated_code_size_in_bytes",
        ):
            v = getattr(ma, name, None)
            if v is not None:
                res[name] = int(v)
    except Exception as e:
        res["memory_analysis_error"] = f"{type(e).__name__}: {e}"
    # HLO census: full-table-shaped ops by kind (copies = donation failure;
    # fusions producing table-shaped temps = materialized backward)
    try:
        txt = compiled.as_text()
        rows = item_length * 2
        # count ops whose OUTPUT is table-shaped
        pat = re.compile(rf"^\s*%?(\S+?)\.?\d* = f32\[{rows},128\]", re.M)
        kinds = {}
        for mline in re.finditer(
            rf"^\s*\S+ = f32\[{rows},128\][^\n]*", txt, re.M
        ):
            line = mline.group(0)
            m2 = re.search(r"=\s*f32\[[0-9,]+\]\{[^}]*\}\s+(\w+)", line)
            kind = m2.group(1) if m2 else "?"
            kinds[kind] = kinds.get(kind, 0) + 1
        res["table_shaped_ops"] = kinds
        res["hlo_bytes"] = len(txt)
        del pat
    except Exception as e:
        res["hlo_error"] = f"{type(e).__name__}: {e}"
    for k, v in sorted(res.items()):
        print(f"B[{item_length}] {k}: {v}", flush=True)
    return res


def main() -> None:
    out = {}
    out["stage_census_8192"] = stage_census()
    out["mem_healthy_894k"] = memory_census(447410)
    out["mem_cliff_4m"] = memory_census(2_000_000)
    from pathlib import Path

    Path("results").mkdir(exist_ok=True)
    Path("results/roofline_8192.json").write_text(json.dumps(out, indent=1))
    print("wrote results/roofline_8192.json", flush=True)


if __name__ == "__main__":
    main()
