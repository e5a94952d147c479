#!/usr/bin/env python
"""Headline benchmark: flagship training-step throughput (examples/s).

Config = the reference's canonical run (run.sh:1): SASRec backbone +
InterComp + DR heads, batch 256, seq_len 20, emb_dim 128, full mybank-scale
vocab (894,820-row item table). Synthetic ids (the step is data-independent
in cost); negative sampling, forward, backward, and the Adam update all run
on device inside one jit program. Default optimizer path is shape-resolved
by measurement (see --lazy): the lazy (touched-rows-only) table Adam at
protocol mybank shapes — the framework's best honest flagship config
(identical model/losses) — and dense Adam at amazon shapes, where it
measures faster (`--lazy`/`--dense` force either; `--dense` is the
reference-equivalent optimizer cost). Kernel dispatch defaults to `auto`
(pallas scatter +
attention on TPU; measurement table in docs/PERF.md, results/perf_pass.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference never instruments throughput (SURVEY.md §6) and its
code is CUDA-only while this host has no GPU. `--baseline` measures an
equivalent torch train step on this host's CPU (same math/model shapes) and
is used to fill REF_BASELINE_EXAMPLES_PER_S below; vs_baseline is measured
TPU throughput over that reference-implementation throughput.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

# torch reference-equivalent step on this host (2-core CPU), measured via
# `python bench.py --baseline` (see bench_baseline()).
REF_BASELINE_EXAMPLES_PER_S = 118.9


def _timed_fetch(compiled) -> float:
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(compiled(jnp.float32(0)))
    return time.perf_counter() - t0


def bench_tpu(steps: int = 100, warmup: int = 3, seq_len: int = 20,
              kernels: str = "auto", lazy: bool = False,
              phase_b: bool = False, bf16: bool = False,
              batch_size: int = 256, matmul_precision: str = "",
              fused_scatter: bool = True, device_loop: bool = True,
              remat: bool = False) -> float:
    # Defaults match the CLI defaults (argparse below) so programmatic
    # callers (tools/perf_pass.py) measure the shipping config: fused
    # 3-array scatter + on-device lax.scan timing loop.
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _flagship_cfg, _make_batch
    from amid_tpu.models.amid import build_model
    from amid_tpu.train.steps import TrainState, make_train_step

    cfg = _flagship_cfg(item_length=447410, batch_size=batch_size,
                        seq_len=seq_len)
    cfg.kernels = kernels
    cfg.use_bf16 = bf16
    cfg.matmul_precision = matmul_precision
    cfg.remat = remat
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    batch = _make_batch(cfg, num_neg=1, rng=rng)
    bs = cfg.batch_size
    batch["domain_id"] = jnp.asarray(rng.integers(0, 2, bs, dtype=np.int32))
    pool_len = 65536
    # reject holds ascending *pool positions* (realistic hole count ~ mean
    # sequence length), sentinel-padded with P
    rej = np.sort(rng.integers(0, pool_len, (bs, 44)), axis=1).astype(np.int32)
    batch["reject"] = jnp.asarray(rej)
    batch["reject_counts"] = jnp.full((bs,), 44, jnp.int32)
    batch["ob_label"] = jnp.ones((bs,), jnp.int32)
    pools = jnp.asarray(
        np.sort(rng.integers(0, cfg.item_table_size, (2, pool_len)), axis=1)
        .astype(np.int32)
    )
    pool_sizes = jnp.array([pool_len, pool_len], jnp.int32)

    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, batch, train=False)[
        "params"
    ]
    tx = optax.adam(5e-4)
    tx2 = optax.adam(5e-4 * 0.01)  # run.sh lr2=0.01 (relative)
    if lazy:
        from amid_tpu.train.lazy import (
            init_lazy_state, make_lazy_dr_r_step, make_lazy_train_step,
        )

        state = init_lazy_state(params, tx, tx2 if phase_b else None)
        step = (
            make_lazy_dr_r_step(model, tx2, 5e-4 * 0.01,
                                kernels=model.cfg.kernels,
                                fused_scatter=fused_scatter)
            if phase_b
            else make_lazy_train_step(model, tx, 5e-4, dr_e_w=0.01,
                                      kernels=model.cfg.kernels,
                                      fused_scatter=fused_scatter)
        )
    else:
        from amid_tpu.train.steps import make_dr_r_step

        state = TrainState(params, tx.init(params),
                           tx2.init(params) if phase_b else None)
        step = (make_dr_r_step(model, tx2) if phase_b
                else make_train_step(model, tx, dr_e_w=0.01))
    loss_key = "loss_dr_r" if phase_b else "loss"

    for i in range(warmup):
        state, m = step(state, batch, pools, pool_sizes, jax.random.fold_in(key, i))
    float(m[loss_key])  # host fetch: the only true sync through the TPU tunnel

    # Tunnel round-trip floor: time a FRESH compiled no-op call + fetch (a
    # re-fetch of an already-materialized array never crosses the tunnel —
    # jax caches the host value, so it measures ~µs, not the ~24 ms RTT).
    @jax.jit
    def _noop(x):
        return x + 1.0

    _c = _noop.lower(jnp.float32(0)).compile()
    float(_c(jnp.float32(0)))  # warmup
    rtt = min(_timed_fetch(_c) for _ in range(5))

    if device_loop:
        # Steady-state on-device loop: lax.scan carries the TrainState, so
        # the host dispatches ONE program for all `steps` steps. Immune to
        # host load / dispatch starvation (CLAUDE.md host-load note) and to
        # the per-step tunnel dispatch cost — the robust way to time the
        # step while anything CPU-heavy shares the 2-core host. Per-step
        # keys fold the scan index, matching the host loop's stream shape.
        def body(s, i):
            s2, m = step(s, batch, pools, pool_sizes,
                         jax.random.fold_in(key, 100 + i))
            return s2, m[loss_key]

        @jax.jit
        def loop(s):
            _, losses = jax.lax.scan(body, s, jnp.arange(steps))
            return losses[-1]

        compiled = loop.lower(state).compile()
        float(compiled(state))  # warmup; host fetch = true completion
        dts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(compiled(state))
            dts.append(time.perf_counter() - t0)
        dt = max(min(dts) - rtt, 1e-9)
        return steps * cfg.batch_size / dt

    t0 = time.perf_counter()
    for i in range(steps):
        state, m = step(
            state, batch, pools, pool_sizes, jax.random.fold_in(key, 100 + i)
        )
    float(m[loss_key])  # waits on the full dependency chain of all steps
    dt = max(time.perf_counter() - t0 - rtt, 1e-9)
    return steps * cfg.batch_size / dt


def bench_baseline(steps: int = 3) -> float:
    """Reference-equivalent torch train step on CPU (the reference itself is
    .cuda()-hard-coded; this reproduces its per-step math/shape for a
    throughput baseline on the hardware available here)."""
    import torch

    torch.manual_seed(0)
    b, l, d, hid, v = 256, 20, 128, 32, 894820

    class TorchStep(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = torch.nn.Embedding(v, d)
            self.pos1 = torch.nn.Embedding(l, d)
            self.pos2 = torch.nn.Embedding(l, d)
            enc = lambda: torch.nn.ModuleList(
                [
                    torch.nn.ModuleDict(
                        dict(
                            ln_q=torch.nn.LayerNorm(d, eps=1e-8),
                            attn=torch.nn.MultiheadAttention(d, 8, 0.5),
                            ln_f=torch.nn.LayerNorm(d, eps=1e-8),
                            c1=torch.nn.Linear(d, d),
                            c2=torch.nn.Linear(d, d),
                        )
                    )
                    for _ in range(2)
                ]
            )
            self.enc1, self.enc2 = enc(), enc()
            self.ln_last1 = torch.nn.LayerNorm(d, eps=1e-8)
            self.ln_last2 = torch.nn.LayerNorm(d, eps=1e-8)
            self.itc_nn1 = torch.nn.Linear(d, d)
            self.itc_bs1 = torch.nn.Linear(b, 1)
            self.itc_nn2 = torch.nn.Linear(d, d)
            self.itc_bs2 = torch.nn.Linear(b, 1)
            mlp = lambda: torch.nn.Sequential(
                torch.nn.Linear(2 * d, hid), torch.nn.ReLU(),
                torch.nn.Linear(hid, 1),
            )
            self.head, self.ips, self.gfunc = mlp(), mlp(), mlp()

        def encode(self, blocks, ln_last, pos, x):
            x = x + pos.weight[None]
            causal = torch.triu(torch.full((l, l), float("-inf")), 1)
            for blk in blocks:
                q = blk["ln_q"](x)
                a, _ = blk["attn"](
                    q.transpose(0, 1), x.transpose(0, 1), x.transpose(0, 1),
                    attn_mask=causal,
                )
                x = q + a.transpose(0, 1)
                x = blk["ln_f"](x)
                x = x + blk["c2"](torch.relu(blk["c1"](x)))
            return ln_last(x)

        def itc(self, nn_l, bs_l, s_self, s_peer):
            aff = torch.einsum("bid,cjd->bcij", s_self, s_peer).amax((2, 3))
            gate = torch.softmax(aff, 1)
            adj = (gate > 0.4).float()
            msg = torch.einsum(
                "bc,cme->bme", adj * bs_l.weight[0][None], nn_l(s_peer)
            ) + bs_l.bias
            return torch.cat([s_self, msg], 1)

        def forward(self, tgt, neg, s1, s2):
            f1, f2 = self.emb(s1), self.emb(s2)
            e1 = self.encode(self.enc1, self.ln_last1, self.pos1, f1)
            e2 = self.encode(self.enc2, self.ln_last2, self.pos2, f2)
            m1 = self.itc(self.itc_nn1, self.itc_bs1, e1, e2)
            m2 = self.itc(self.itc_nn2, self.itc_bs2, e2, e1)
            u1, u2 = m1.mean(1), m2.mean(1)
            cand = torch.cat([self.emb(tgt)[:, None], self.emb(neg)], 1)
            outs = []
            for head in (self.head, self.ips, self.gfunc):
                for u in (u1, u2):
                    uu = u[:, None].expand(-1, cand.shape[1], -1)
                    outs.append(torch.sigmoid(head(torch.cat([uu, cand], -1))))
            return outs

    m = TorchStep()
    opt = torch.optim.Adam(m.parameters(), 5e-4)
    tgt = torch.randint(0, v, (b,))
    neg = torch.randint(0, v, (b, 1))
    s1 = torch.randint(0, v, (b, l))
    s2 = torch.randint(0, v, (b, l))
    labels = torch.zeros(b, 2)
    labels[:, 0] = 1
    dom = torch.randint(0, 2, (b,)).float()
    crit = torch.nn.BCELoss(reduction="none")

    def one_step():
        p1, p2, i1, i2, g1, g2 = [o.squeeze(-1) for o in m(tgt, neg, s1, s2)]
        m1 = (1 - dom)[:, None]
        m2_ = dom[:, None]
        loss_cls = torch.mean(crit(p1, labels) * m1 + crit(p2, labels) * m2_)
        dr_e = torch.mean(
            (crit(p1, labels) - g1) ** 2 / i1 * m1
            + (crit(p2, labels) - g2) ** 2 / i2 * m2_
        )
        loss = loss_cls + 0.01 * dr_e
        opt.zero_grad()
        loss.backward()
        opt.step()

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    return steps * b / (time.perf_counter() - t0)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", action="store_true")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--seq_len", type=int, default=20,
                    help="20 = mybank flagship (run.sh); 150 = amazon shape")
    ap.add_argument("--kernels", default="auto")
    ap.add_argument("--batch", type=int, default=256,
                    help="step batch size (protocol is 256; larger batches "
                         "show the capability headroom — the bs-256 fwd+bwd "
                         "underfills the MXU, docs/PERF.md lazy roofline)")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 matmul mode (no-op on TPU: DEFAULT precision "
                         "is already bf16-input/fp32-acc — docs/PERF.md)")
    ap.add_argument("--fused_scatter", dest="fused_scatter",
                    action="store_true", default=True,
                    help="one fused 3-array pallas scatter instead of three "
                         "kernel calls (default since the round-3 device-"
                         "loop A/B — docs/PERF.md)")
    ap.add_argument("--no_fused_scatter", dest="fused_scatter",
                    action="store_false",
                    help="three-call scatter path (the A/B control)")
    ap.add_argument("--matmul_precision", default="",
                    help="explicit precision context; 'highest' = true-fp32 "
                         "3-pass matmuls (the expensive direction)")
    ap.add_argument("--phase_b", action="store_true",
                    help="measure the DR phase-B (dr_r/optimizer2) step")
    ap.add_argument("--device_loop", dest="device_loop", action="store_true",
                    default=True,
                    help="time a lax.scan of the step on device (default: "
                         "load-robust, no per-step host dispatch; the honest "
                         "steady-state TPU number — see CLAUDE.md host-load "
                         "note)")
    ap.add_argument("--host_loop", dest="device_loop", action="store_false",
                    help="legacy host-dispatched timing loop (async pipeline;"
                         " measures the 2-core host under load, not the chip)")
    ap.add_argument("--lazy", dest="lazy", action="store_true", default=None,
                    help="sparse table updates (train/lazy.py). Default is "
                         "shape-resolved by measurement: lazy at protocol "
                         "mybank shapes (seq_len 20: 49.9k vs 21.7k dense), "
                         "dense at amazon shapes (seq_len 150: 9.6k dense vs "
                         "8.1k lazy — longer sequences touch ~7x the table "
                         "rows per step, eroding the sparse win; round-5 "
                         "perf_pass/STATUS.md)")
    ap.add_argument("--dense", dest="lazy", action="store_false",
                    help="dense Adam over the full table (reference-"
                         "equivalent optimizer cost)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize encoder blocks in the backward "
                         "(trades recompute for activation HBM traffic — "
                         "the bs-8192 capability point is ~95% HBM-bound, "
                         "results/roofline_8192.json)")
    args = ap.parse_args()
    if args.lazy is None:
        # measured crossover between the two committed points (docstring of
        # --lazy); both optimizers train the same model/losses
        args.lazy = args.seq_len < 100
    if args.baseline:
        eps = bench_baseline()
        print(json.dumps({"metric": "baseline_train_examples_per_s",
                          "value": round(eps, 1), "unit": "examples/s",
                          "vs_baseline": 1.0}))
    else:
        eps = bench_tpu(steps=args.steps, seq_len=args.seq_len,
                        kernels=args.kernels, lazy=args.lazy,
                        phase_b=args.phase_b, bf16=args.bf16,
                        batch_size=args.batch,
                        matmul_precision=args.matmul_precision,
                        fused_scatter=args.fused_scatter,
                        device_loop=args.device_loop, remat=args.remat)
        print(json.dumps({
            "metric": "train_examples_per_s",
            "value": round(eps, 1),
            "unit": "examples/s",
            "vs_baseline": round(eps / REF_BASELINE_EXAMPLES_PER_S, 2),
        }))
