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
        eps = bench.bench_tpu(steps=steps, **kw)
        ms = 256.0 / eps * 1000.0
        out[name] = {"examples_per_s": round(eps, 1), "ms_per_step": round(ms, 2)}
        print(f"A {name}: {eps:,.0f} ex/s ({ms:.2f} ms/step)", flush=True)
    return out


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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--skip-kernels", action="store_true")
    a = ap.parse_args()
    print(f"tunnel RTT: {tunnel_rtt()*1e3:.1f} ms", flush=True)
    out = {"rtt_ms": tunnel_rtt() * 1e3}
    out["steps"] = step_suite(a.steps)
    out["breakdown"] = breakdown()
    os.makedirs("results", exist_ok=True)
    with open("results/perf_pass.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
