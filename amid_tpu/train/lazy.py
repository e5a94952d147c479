"""Lazy (sparse) Adam for the embedding table.

Dense Adam touches every row of the item table each step — params + mu + nu
(~3 GB of HBM traffic at the mybank vocab) for a step that gathers ~11k
rows. The reference pays the same (torch embedding grads are dense by
default), so dense is the parity default; this opt-in path
(`--lazy_table_adam`) restructures the step so the table's gradient is never
materialized and only touched rows' parameters/moments move:

1. negatives are sampled first, then the step's unique ids are computed
   (jnp.unique with a static size budget, out-of-range sentinel padding);
2. the touched rows are gathered ONCE and become the differentiated leaf —
   the model's lookups are redirected to positions within them
   (searchsorted over the sorted unique ids; parallel.context.lazy_rows);
3. the [U, D] row gradient drives a per-row Adam update scattered back with
   mode='drop' (sentinel rows vanish); dense params use optax.adam as usual.

Both DR phases are covered: `make_lazy_train_step` is the phase-A step
(masked BCE + dr_e_w * dr_e when DR, train_sr_dr.py:191-229) updating
optimizer-1 moments, `make_lazy_dr_r_step` is the phase-B step
(imputation/propensity training with optimizer2, train_sr_dr.py:363-403)
updating a second, independent set of table moments (the reference keeps
two full torch Adam states over all params; here each is dense-params +
per-row table moments).

Semantics: identical to dense Adam on the first touch of each row; diverges
only in that an untouched row's moments do not decay that step (standard
lazy-Adam behavior, cf. torch.optim.SparseAdam). The single-step equivalence
is tested exactly (test_lazy_adam).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from amid_tpu.data.sampler import sample_negatives
from amid_tpu.parallel import context
from amid_tpu.train import losses
from amid_tpu.train.steps import (
    TrainState, _make_labels, _model_batch, nonfinite_flag,
)

TABLE_KEY = "item_embedding"


class LazyTableState(NamedTuple):
    dense_opt: object  # optax state over the non-table params
    mu: jax.Array  # [V, D]
    nu: jax.Array  # [V, D]
    count: jax.Array  # scalar int32 (global step, for bias correction)


def _init_slot(table, dense, tx):
    return LazyTableState(
        dense_opt=tx.init(dense),
        mu=jnp.zeros_like(table),
        nu=jnp.zeros_like(table),
        count=jnp.zeros((), jnp.int32),
    )


def init_lazy_state(
    params,
    tx_dense: optax.GradientTransformation,
    tx2_dense: Optional[optax.GradientTransformation] = None,
) -> TrainState:
    table = params[TABLE_KEY]
    dense = {k: v for k, v in params.items() if k != TABLE_KEY}
    opt = _init_slot(table, dense, tx_dense)
    opt2 = _init_slot(table, dense, tx2_dense) if tx2_dense is not None else None
    return TrainState(params, opt, opt2)


def _unique_budget(batch_size: int, seq_len: int, num_neg: int) -> int:
    total = batch_size * (1 + num_neg + 2 * seq_len)
    return -(-total // 1024) * 1024


def _make_lazy_step(
    model,
    tx_dense: optax.GradientTransformation,
    lr: float,
    loss_builder: Callable,
    slot: int,
    b1: float,
    b2: float,
    eps: float,
    kernels: str = "xla",
    fused_scatter: bool = True,
) -> Callable:
    """Shared lazy-step skeleton. loss_builder(out, labels, batch) ->
    (loss, metrics); slot selects which optimizer state (1 = opt_state,
    2 = opt_state2) is read and written — the other passes through."""
    # uids are sorted-unique (sentinel tail) => the pallas scatters are
    # duplicate-free and the in-place add equals a set of the updated
    # gathered rows. In-step A/B on an idle host (tools/perf_pass.py,
    # results/perf_pass.json, 2026-08-20): 6.83 ms/step with XLA
    # scatters vs 5.27 ms/step with the per-row-DMA kernel at the
    # flagship config (37.5k -> 48.6k ex/s), so "pallas" (the TPU
    # default via kernels=auto) dispatches it — except above the SMEM
    # prefetch limit, see _pallas_scatter_fits below.
    def xla_scatter_add_neg(table, uids, rows, upd):
        return table.at[uids].add(-upd, mode="drop")

    def xla_scatter_set(arr, uids, vals):
        return arr.at[uids].set(vals, mode="drop")

    def _pallas_scatter_fits(u_budget: int) -> bool:
        # The pallas scatter kernels prefetch `uids` ([U] int32) into
        # scalar memory (PrefetchScalarGridSpec); v5e SMEM is 1 MB, so the
        # kernel stops compiling beyond ~256k ids. Measured: bs 4096
        # (172,032 ids = 688 KB) compiles and runs; bs 8192 (344,064 ids)
        # fails AOT with "Allocation (size=1376256) would exceed memory
        # (size=1048576) space=smem". Keep 25% headroom for the kernel's
        # other scalars and dispatch XLA scatters above it (the capability
        # sweeps, results/bench_dense_sweep.out, cover which optimizer
        # wins at those batches anyway). The 1 MB budget is the v5e
        # generation's (the measured target); other TPU generations differ
        # (e.g. some have larger SMEM) — re-measure the AOT threshold
        # before trusting this constant on a new generation.
        return u_budget * 4 <= 786_432

    # Donating the state lets XLA update the table/moment buffers in place:
    # without it every step pays full-buffer copies before the scatters
    # (measured 12.5 -> 8.7 ms/step at the flagship config; docs/PERF.md
    # "scatter study"). The callers all thread state functionally.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, pools, pool_sizes, key):
        params = state.params
        table = params[TABLE_KEY]
        v = table.shape[0]
        opt: LazyTableState = state.opt_state if slot == 1 else state.opt_state2

        k_neg, k_drop = jax.random.split(key)
        neg = sample_negatives(
            k_neg, pools, pool_sizes, batch["domain_id"], batch["reject"],
            1, batch.get("reject_counts"),
        )
        labels = _make_labels(batch["target"].shape[0], 1)

        all_ids = jnp.concatenate([
            batch["target"].reshape(-1), neg.reshape(-1),
            batch["seq_d1"].reshape(-1), batch["seq_d2"].reshape(-1),
        ])
        u_budget = _unique_budget(
            batch["target"].shape[0], batch["seq_d1"].shape[1], neg.shape[1]
        )
        uids = jnp.unique(all_ids, size=u_budget, fill_value=v)  # sorted; sentinel tail
        safe = jnp.minimum(uids, v - 1)
        rows = jnp.take(table, safe, axis=0)  # [U, D] — the diff leaf

        dense = {k: p for k, p in params.items() if k != TABLE_KEY}

        def loss_fn(dense_params, rows):
            full = dict(dense_params)
            full[TABLE_KEY] = jax.lax.stop_gradient(table)  # unused (redirected)
            with context.lazy_rows(uids, rows):
                out = model.apply(
                    {"params": full}, _model_batch(batch, neg),
                    train=True, rngs={"dropout": k_drop},
                )
            return loss_builder(out, labels, batch)

        (_, metrics), (g_dense, g_rows) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(dense, rows)
        metrics["nonfinite"] = nonfinite_flag(metrics)

        # dense params: plain optax adam
        updates, dense_opt = tx_dense.update(g_dense, opt.dense_opt, dense)
        dense_new = optax.apply_updates(dense, updates)

        # touched table rows: per-row adam with global-step bias correction
        count = opt.count + 1
        mu_rows = jnp.take(opt.mu, safe, axis=0)
        nu_rows = jnp.take(opt.nu, safe, axis=0)
        mu_new = b1 * mu_rows + (1.0 - b1) * g_rows
        nu_new = b2 * nu_rows + (1.0 - b2) * g_rows**2
        c = count.astype(jnp.float32)
        mhat = mu_new / (1.0 - b1**c)
        vhat = nu_new / (1.0 - b2**c)
        upd = lr * mhat / (jnp.sqrt(vhat) + eps)
        use_pallas = kernels == "pallas" and _pallas_scatter_fits(u_budget)
        if use_pallas and fused_scatter:
            # one kernel, 3xN DMAs in a single issue window — the measured
            # default since the round-3 device-loop A/B: 49,939 vs 48,933
            # ex/s (train) and 49,735 vs 49,079 (phase B) against the
            # three-call path, same run (results/bench_device_loop.out;
            # --fused_scatter/-no flag in bench.py, docs/PERF.md)
            from amid_tpu.ops.pallas_scatter import scatter_set_unique3_pallas

            table_new, mu_t, nu_t = scatter_set_unique3_pallas(
                table, opt.mu, opt.nu, uids, rows - upd, mu_new, nu_new)
        elif use_pallas:
            from amid_tpu.ops.pallas_scatter import scatter_set_unique_pallas

            table_new = scatter_set_unique_pallas(table, uids, rows - upd)
            mu_t = scatter_set_unique_pallas(opt.mu, uids, mu_new)
            nu_t = scatter_set_unique_pallas(opt.nu, uids, nu_new)
        else:
            table_new = xla_scatter_add_neg(table, uids, rows, upd)
            mu_t = xla_scatter_set(opt.mu, uids, mu_new)
            nu_t = xla_scatter_set(opt.nu, uids, nu_new)

        params_new = dict(dense_new)
        params_new[TABLE_KEY] = table_new
        opt_new = LazyTableState(dense_opt, mu_t, nu_t, count)
        new_state = TrainState(
            params_new,
            opt_new if slot == 1 else state.opt_state,
            state.opt_state2 if slot == 1 else opt_new,
        )
        return new_state, metrics

    return step


def make_lazy_train_step(
    model,
    tx_dense: optax.GradientTransformation,
    lr: float,
    dr_e_w: Optional[float] = None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    kernels: str = "xla",
    fused_scatter: bool = True,
) -> Callable:
    """Phase-A step (masked BCE, + dr_e_w * dr_e when DR) on optimizer 1."""
    is_dr = dr_e_w is not None

    def loss_builder(out, labels, batch):
        loss_cls = losses.masked_bce_loss(
            out["logits_d1"], out["logits_d2"], labels, batch["domain_id"]
        )
        metrics = {"loss_cls": loss_cls}
        loss = loss_cls
        if is_dr:
            dr_e = losses.dr_e_loss(out, labels, batch["domain_id"])
            loss = loss_cls + dr_e * dr_e_w
            metrics["loss_dr_e"] = dr_e
        metrics["loss"] = loss
        return loss, metrics

    return _make_lazy_step(model, tx_dense, lr, loss_builder, 1, b1, b2, eps,
                           kernels, fused_scatter)


def make_lazy_dr_r_step(
    model,
    tx2_dense: optax.GradientTransformation,
    lr2: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    kernels: str = "xla",
    fused_scatter: bool = True,
) -> Callable:
    """Phase-B step (train_sr_dr.py:363-403): imputation/propensity heads on
    observed+unobserved rows, optimizer2 — with lazy table updates against
    the second per-row moment set."""

    def loss_builder(out, labels, batch):
        loss = losses.dr_r_loss(
            out, labels, batch["domain_id"], batch["ob_label"]
        )
        return loss, {"loss_dr_r": loss}

    return _make_lazy_step(model, tx2_dense, lr2, loss_builder, 2, b1, b2, eps,
                           kernels, fused_scatter)
