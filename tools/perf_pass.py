"""One clean perf pass (VERDICT r1 item 4) — run on an idle host + chip.

Produces, with the RTT-corrected harness (tools/bench_kernels.py):
  A. step-suite: examples/s for every flagship config, incl. the lazy-step
     scatter-dispatch A/B (kernels=xla vs pallas at T=20, where attention
     doesn't engage — isolating the scatter choice) that settles the
     lazy.py / pallas_scatter.py / PERF.md contradiction.
  B. step-time decomposition of the flagship step: embedding gather+pool /
     tower encoders / comp / heads (full fwd) / fwd+bwd / optimizer, by
     incremental jit programs.
  C. achieved-vs-HBM-bound roofline for the dense and lazy steps.

Writes results/perf_pass.json and prints a markdown table for PERF.md.
Usage: python tools/perf_pass.py [--steps 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.bench_kernels import V5E_HBM_GBS, device_time, tunnel_rtt  # noqa: E402

EMB_ROWS = 894_820  # mybank item_table_size (447,410 * 2)
D = 128


def step_suite(steps: int) -> dict:
    import bench

    out = {}
    configs = [
        ("mybank_dense_auto", dict(seq_len=20, kernels="auto")),
        ("mybank_lazy_scatter_xla", dict(seq_len=20, kernels="xla", lazy=True)),
        ("mybank_lazy_scatter_pallas",
         dict(seq_len=20, kernels="pallas", lazy=True)),
        ("mybank_lazy_phase_b", dict(seq_len=20, kernels="xla", lazy=True,
                                     phase_b=True)),
        ("mybank_lazy_phase_b_pallas", dict(seq_len=20, kernels="pallas",
                                            lazy=True, phase_b=True)),
        ("amazon_xla", dict(seq_len=150, kernels="xla")),
        ("amazon_pallas_attn", dict(seq_len=150, kernels="pallas")),
    ]
    for name, kw in configs:
        # shipping config, stated explicitly: fused 3-array scatter +
        # on-device lax.scan timing (robust to host load, CLAUDE.md)
        eps = bench.bench_tpu(steps=steps, fused_scatter=True,
                              device_loop=True, **kw)
        ms = 256.0 / eps * 1000.0
        out[name] = {"examples_per_s": round(eps, 1), "ms_per_step": round(ms, 2),
                     "harness": "device_loop"}
        print(f"A {name}: {eps:,.0f} ex/s ({ms:.2f} ms/step)", flush=True)
    out["mybank_eval_999negs"] = eval_step_time()
    return out


def eval_step_time() -> dict:
    """Eval-pass cost at the protocol config (999 negatives): the 50-epoch
    runs alternate train epochs with this, so it belongs in the step table.
    device_time loop (robust to host load)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg, _make_batch
    from amid_tpu.models.amid import build_model
    from amid_tpu.train.steps import make_eval_step

    cfg = _flagship_cfg(item_length=447410, batch_size=256, seq_len=20)
    cfg.kernels = "auto"
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = _make_batch(cfg, num_neg=1, rng=rng)
    batch["domain_id"] = jnp.asarray(rng.integers(0, 2, 256, dtype=np.int32))
    batch["reject"] = jnp.full((256, 4), cfg.item_table_size, jnp.int32)
    batch["reject_counts"] = jnp.zeros((256,), jnp.int32)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, batch, train=False)[
        "params"]
    v = cfg.item_table_size
    pools = jnp.stack([jnp.arange(v, dtype=jnp.int32)] * 2)
    pool_sizes = jnp.array([v, v], jnp.int32)
    ev = make_eval_step(model, 999)

    def f(params, s1, salt):
        b = dict(batch)
        b["seq_d1"] = s1 + 0 * salt.astype(jnp.int32)
        # fold the salt into the key so the negative draws stay loop-variant
        # (a constant key would let XLA hoist sampling out of the scan)
        k = jax.random.fold_in(jax.random.PRNGKey(3), salt.astype(jnp.int32))
        r = ev(params, b, pools, pool_sizes, k)
        return (r["loss_cls"] + r["ranks_fixed"].sum()
                + r["ranks_raw"].sum())

    t = device_time(f, (params, batch["seq_d1"]), iters=20)
    eps = 256.0 / t
    print(f"A mybank_eval_999negs: {eps:,.0f} ex/s ({t*1e3:.2f} ms/step)",
          flush=True)
    return {"examples_per_s": round(eps, 1), "ms_per_step": round(t * 1e3, 2),
            "harness": "device_time"}


def breakdown() -> dict:
    """Incremental-program decomposition at the flagship config."""
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _flagship_cfg, _make_batch
    from amid_tpu.models.amid import build_model
    from amid_tpu.train import losses
    from amid_tpu.train.steps import TrainState, _make_labels, make_train_step

    cfg = _flagship_cfg(item_length=447410, batch_size=256, seq_len=20)
    cfg.kernels = "xla"
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = _make_batch(cfg, num_neg=1, rng=rng)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, batch, train=False)[
        "params"
    ]
    labels = _make_labels(256, 1)
    dom = jnp.asarray(rng.integers(0, 2, 256, dtype=np.int32))

    table = params["item_embedding"]

    # De-hoisting: `0 * salt` constant-folds (the first run of this script
    # reported a 0.008 ms "features" — XLA hoisted the whole loop-invariant
    # model out of the scan). `where(salt < 0, 1, 0)` is runtime-opaque (salt
    # is a data-dependent carry), evaluates to 0, and makes the gather
    # indices — hence everything downstream — loop-dependent.
    def _bump(salt):
        return jnp.where(salt < 0.0, 1, 0).astype(jnp.int32)

    def gather_pool(t, s1, s2, salt):
        a = jnp.take(t, s1 + _bump(salt), axis=0).mean(axis=1)
        b = jnp.take(t, s2, axis=0).mean(axis=1)
        return a + b

    def features(p, s1, s2, salt):
        u1, u2 = model.apply(
            {"params": p}, {"seq_d1": s1 + _bump(salt), "seq_d2": s2},
            train=False, features_only=True,
        )
        return u1 + u2

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
        # full-sum every grad leaf: a `* 0.0` weight folds and DCEs the
        # entire backward (a run of this script reported 0.35 ms fwd+bwd).
        return jnp.stack(
            [loss] + [jnp.sum(g) for g in jax.tree_util.tree_leaves(grads)]
        )

    tx = optax.adam(5e-4)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(lambda x: jnp.ones_like(x) * 1e-6, params)

    # Dense Adam is timed with the carry-chained harness: iteration i+1's
    # update consumes iteration i's params/moments, so nothing is
    # loop-invariant even though the grads are held constant (the real
    # traffic — p/mu/nu read+write over the 894,820x128 table — is identical).
    def adam_step(c):
        p, os_ = c
        updates, os2 = tx.update(grads, os_, p)
        return (optax.apply_updates(p, updates), os2)

    def adam_probe(c):
        import jax.numpy as jnp2

        return jnp2.sum(c[0]["item_embedding"][:8])

    res = {}
    t = device_time(gather_pool, (table, batch["seq_d1"], batch["seq_d2"]),
                    iters=50)
    res["gather_pool_ms"] = t * 1e3
    t = device_time(features, (params, batch["seq_d1"], batch["seq_d2"]),
                    iters=50)
    res["features_ms"] = t * 1e3  # gather + InC/ItC + encoders + pool
    t = device_time(
        forward,
        (params, batch["target"], batch["neg_samples"], batch["seq_d1"],
         batch["seq_d2"]), iters=50,
    )
    res["forward_ms"] = t * 1e3  # features + heads
    t = device_time(
        fwd_bwd,
        (params, batch["target"], batch["neg_samples"], batch["seq_d1"],
         batch["seq_d2"]), iters=20,
    )
    res["fwd_bwd_ms"] = t * 1e3
    from tools.bench_kernels import device_time_carry

    t = device_time_carry(adam_step, (params, opt_state), adam_probe, iters=20)
    res["dense_adam_ms"] = t * 1e3

    # full fused steps for reference (host-driven like training, single
    # programs — measured via bench in the step suite; reuse fwd_bwd+adam sum
    res["encoders_comp_ms"] = res["features_ms"] - res["gather_pool_ms"]
    res["heads_ms"] = res["forward_ms"] - res["features_ms"]
    res["backward_ms"] = res["fwd_bwd_ms"] - res["forward_ms"]

    # HBM roofline: dense Adam moves params+mu+nu read & write + grad read of
    # the 894,820 x 128 fp32 table (the dense tree is dominated by it).
    table_bytes = EMB_ROWS * D * 4
    adam_traffic = 7 * table_bytes  # p r/w, mu r/w, nu r/w, g r
    res["dense_adam_hbm_bound_ms"] = adam_traffic / (V5E_HBM_GBS * 1e9) * 1e3
    res["dense_adam_hbm_pct"] = (
        100.0 * res["dense_adam_hbm_bound_ms"] / max(res["dense_adam_ms"], 1e-9)
    )
    for k, v in sorted(res.items()):
        print(f"B {k}: {v:.2f}", flush=True)
    return res


def lazy_breakdown() -> dict:
    """Decompose the SHIPPING (lazy, pallas-scatter) step — VERDICT r2 weak
    #2: what bounds the 5.3 ms? Incremental jit programs mirroring
    train/lazy.py::_make_lazy_step stage by stage, each consuming its
    outputs non-factorably."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg, _make_batch
    from amid_tpu.data.sampler import sample_negatives
    from amid_tpu.models.amid import build_model
    from amid_tpu.parallel import context
    from amid_tpu.train import losses
    from amid_tpu.train.lazy import _unique_budget
    from amid_tpu.train.steps import _make_labels, _model_batch

    cfg = _flagship_cfg(item_length=447410, batch_size=256, seq_len=20)
    cfg.kernels = "xla"
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = _make_batch(cfg, num_neg=1, rng=rng)
    # sampler inputs (_make_batch only carries the model keys)
    batch["domain_id"] = jnp.asarray(rng.integers(0, 2, 256, dtype=np.int32))
    batch["reject"] = jnp.full((256, 4), cfg.item_table_size, jnp.int32)
    batch["reject_counts"] = jnp.zeros((256,), jnp.int32)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, batch, train=False)[
        "params"
    ]
    labels = _make_labels(256, 1)
    table = params["item_embedding"]
    v = table.shape[0]
    dense = {k: p for k, p in params.items() if k != TABLE_KEY_}
    mu = jnp.zeros_like(table)
    nu = jnp.zeros_like(table)
    B, L = batch["seq_d1"].shape[0], batch["seq_d1"].shape[1]
    u_budget = _unique_budget(B, L, 1)
    # synthetic pools: every id its own pool slot
    pools = jnp.stack([jnp.arange(v, dtype=jnp.int32)] * 2)
    pool_sizes = jnp.array([v, v], jnp.int32)

    def _bump(salt):
        return jnp.where(salt < 0.0, 1, 0).astype(jnp.int32)

    def stage_unique(s1, s2, tgt, key, salt):
        # `domain_id * (1 - bump)` == domain_id at runtime but makes the
        # sampling loop-dependent (a loop-invariant key would let XLA hoist
        # the whole sampler out of the scan).
        neg = sample_negatives(
            key, pools, pool_sizes,
            batch["domain_id"] * (1 - _bump(salt)), batch["reject"],
            1, batch.get("reject_counts"),
        )
        all_ids = jnp.concatenate([
            (tgt + _bump(salt)).reshape(-1), neg.reshape(-1),
            s1.reshape(-1), s2.reshape(-1),
        ])
        uids = jnp.unique(all_ids, size=u_budget, fill_value=v)
        return uids, neg

    def f_unique(s1, s2, tgt, key, salt):
        uids, neg = stage_unique(s1, s2, tgt, key, salt)
        return uids.sum() + neg.sum()

    def stage_gather(t, m, n_, s1, s2, tgt, key, salt):
        uids, neg = stage_unique(s1, s2, tgt, key, salt)
        safe = jnp.minimum(uids, v - 1)
        rows = jnp.take(t, safe, axis=0)
        mu_rows = jnp.take(m, safe, axis=0)
        nu_rows = jnp.take(n_, safe, axis=0)
        return uids, safe, rows, mu_rows, nu_rows, neg

    def f_gather(t, m, n_, s1, s2, tgt, key, salt):
        uids, safe, rows, mu_rows, nu_rows, neg = stage_gather(
            t, m, n_, s1, s2, tgt, key, salt)
        return rows.sum() + mu_rows.sum() + nu_rows.sum() + uids.sum()

    def stage_grads(t, d, m, n_, s1, s2, tgt, key, salt):
        uids, safe, rows, mu_rows, nu_rows, neg = stage_gather(
            t, m, n_, s1, s2, tgt, key, salt)
        b = dict(batch)
        b["seq_d1"], b["seq_d2"], b["target"] = s1, s2, tgt

        def loss_fn(dense_params, rows):
            full = dict(dense_params)
            full[TABLE_KEY_] = jax.lax.stop_gradient(t)
            with context.lazy_rows(uids, rows):
                out = model.apply(
                    {"params": full}, _model_batch(b, neg), train=False,
                )
            loss = losses.masked_bce_loss(
                out["logits_d1"], out["logits_d2"], labels, b["domain_id"]
            )
            if cfg.is_dr:
                loss = loss + 0.01 * losses.dr_e_loss(out, labels, b["domain_id"])
            return loss

        loss, (g_dense, g_rows) = jax.value_and_grad(
            loss_fn, argnums=(0, 1))(d, rows)
        return uids, rows, mu_rows, nu_rows, g_dense, g_rows, loss

    def f_grads(t, d, m, n_, s1, s2, tgt, key, salt):
        uids, rows, mu_rows, nu_rows, g_dense, g_rows, loss = stage_grads(
            t, d, m, n_, s1, s2, tgt, key, salt)
        return jnp.stack(
            [loss, g_rows.sum()]
            + [jnp.sum(g) for g in jax.tree_util.tree_leaves(g_dense)]
        ).sum()

    def f_rowmath(t, d, m, n_, s1, s2, tgt, key, salt):
        uids, rows, mu_rows, nu_rows, g_dense, g_rows, loss = stage_grads(
            t, d, m, n_, s1, s2, tgt, key, salt)
        mu_new = 0.9 * mu_rows + 0.1 * g_rows
        nu_new = 0.999 * nu_rows + 0.001 * g_rows**2
        upd = 5e-4 * (mu_new / 0.1) / (jnp.sqrt(nu_new / 0.001) + 1e-8)
        return upd.sum() + loss + sum(
            jnp.sum(g) for g in jax.tree_util.tree_leaves(g_dense))

    args_u = (batch["seq_d1"], batch["seq_d2"], batch["target"],
              jax.random.PRNGKey(1))
    args_g = (table, mu, nu) + args_u
    args_f = (table, dense, mu, nu) + args_u

    res = {}
    res["sample_unique_ms"] = device_time(f_unique, args_u, iters=50) * 1e3
    res["plus_row_gathers_ms"] = device_time(f_gather, args_g, iters=50) * 1e3
    res["plus_fwd_bwd_ms"] = device_time(f_grads, args_f, iters=20) * 1e3
    res["plus_row_adam_ms"] = device_time(f_rowmath, args_f, iters=20) * 1e3
    res["gathers_ms"] = res["plus_row_gathers_ms"] - res["sample_unique_ms"]
    res["fwd_bwd_rows_ms"] = res["plus_fwd_bwd_ms"] - res["plus_row_gathers_ms"]
    res["row_adam_ms"] = res["plus_row_adam_ms"] - res["plus_fwd_bwd_ms"]

    # Touched-row HBM traffic bound for the whole lazy step: rows/mu/nu
    # gathered + scattered (r+w each) + table rows r+w ≈ 8 passes over
    # [U, D] fp32, plus the id sort. U = unique budget.
    touched_bytes = 8 * u_budget * D * 4
    res["lazy_touched_hbm_bound_ms"] = touched_bytes / (V5E_HBM_GBS * 1e9) * 1e3
    for k, v_ in sorted(res.items()):
        print(f"L {k}: {v_:.3f}", flush=True)
    return res


TABLE_KEY_ = "item_embedding"


def dense_backward_hlo() -> dict:
    """Explain the dense step's 6.2 ms backward (VERDICT r2 weak #2): count
    full-table [894820, 128] buffer materializations in the compiled
    backward HLO — each costs ~0.56 ms of HBM write at 819 GB/s."""
    import re

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg, _make_batch
    from amid_tpu.models.amid import build_model
    from amid_tpu.train import losses
    from amid_tpu.train.steps import _make_labels

    cfg = _flagship_cfg(item_length=447410, batch_size=256, seq_len=20)
    cfg.kernels = "xla"
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = _make_batch(cfg, num_neg=1, rng=rng)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, batch, train=False)[
        "params"]
    labels = _make_labels(256, 1)
    dom = jnp.asarray(rng.integers(0, 2, 256, dtype=np.int32))

    def loss_fn(p):
        out = model.apply({"params": p}, batch, train=False)
        loss = losses.masked_bce_loss(
            out["logits_d1"], out["logits_d2"], labels, dom)
        if cfg.is_dr:
            loss = loss + 0.01 * losses.dr_e_loss(out, labels, dom)
        return loss

    grad_fn = jax.jit(jax.grad(loss_fn))
    hlo = grad_fn.lower(params).compile().as_text()
    shape = rf"f32\[{cfg.item_table_size},{cfg.emb_dim}\]"
    counts = {
        "scatter": len(re.findall(rf"{shape}.* scatter\(", hlo)),
        "broadcast_or_zeros": len(
            re.findall(rf"{shape}.* (?:broadcast|constant)\(", hlo)),
        "add": len(re.findall(rf"{shape}.* add\(", hlo)),
        "fusion_outputs": len(re.findall(rf"{shape}.* fusion\(", hlo)),
    }
    table_ms = cfg.item_table_size * cfg.emb_dim * 4 / (V5E_HBM_GBS * 1e9) * 1e3
    out = {"full_table_ops": counts, "table_pass_ms": table_ms}
    print(f"H dense-backward full-table ops: {counts} "
          f"(one table pass = {table_ms:.2f} ms)", flush=True)
    return out


def emit_markdown(out: dict) -> str:
    """The PERF.md step + decomposition tables, generated from the measured
    dict (VERDICT r2 item 8: perf_pass emits the table it claims)."""
    lines = ["| config | examples/s | ms/step |", "|---|---|---|"]
    for name, d in out.get("steps", {}).items():
        lines.append(
            f"| {name} | {d['examples_per_s']:,.0f} | {d['ms_per_step']:.2f} |")
    md = "\n".join(lines)
    lb = out.get("lazy_breakdown")
    if lb:
        md += (
            "\n\nLazy-step decomposition (ms): "
            f"sample+unique {lb['sample_unique_ms']:.2f}, "
            f"row gathers {lb['gathers_ms']:.2f}, "
            f"fwd+bwd {lb['fwd_bwd_rows_ms']:.2f}, "
            f"row adam {lb['row_adam_ms']:.2f}; "
            f"touched-row HBM bound {lb['lazy_touched_hbm_bound_ms']:.3f}"
        )
    return md


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--only", default=None,
                    choices=[None, "steps", "breakdown", "lazy", "hlo"],
                    help="run one section and merge into the existing json")
    a = ap.parse_args()
    os.makedirs("results", exist_ok=True)
    path = "results/perf_pass.json"
    out = {}
    if a.only and os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    print(f"tunnel RTT: {tunnel_rtt()*1e3:.1f} ms", flush=True)
    out["rtt_ms"] = tunnel_rtt() * 1e3
    if a.only in (None, "steps"):
        out["steps"] = step_suite(a.steps)
    if a.only in (None, "breakdown"):
        out["breakdown"] = breakdown()
    if a.only in (None, "lazy"):
        out["lazy_breakdown"] = lazy_breakdown()
    if a.only in (None, "hlo"):
        out["dense_backward_hlo"] = dense_backward_hlo()
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print("\n" + emit_markdown(out))


if __name__ == "__main__":
    main()
