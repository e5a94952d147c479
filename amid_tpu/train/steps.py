"""jit-compiled train/eval step builders.

Each reference hot loop (train_sr.py:190-219, train_sr_dr.py:191-229,363-403,
test() train_sr.py:31-128) becomes one fused XLA program: device-side
negative sampling -> forward -> loss -> backward -> Adam update, with no
host round-trips inside the loop (the reference syncs on `loss.item()` every
step and ships full score matrices to numpy in eval).

Steps are built against an abstract model apply-fn so the same builders serve
single-chip jit and mesh-sharded pjit (amid_tpu.parallel.mesh supplies the
shardings).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from amid_tpu.data.sampler import sample_negatives
from amid_tpu.train import losses
from amid_tpu.train.metrics import positive_ranks


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    opt_state2: Optional[Any] = None  # DR phase-B optimizer moments


def init_state(model, cfg, tx, tx2=None, seed: int = 0, sample_batch=None):
    """Initialize params + optimizer state(s). sample_batch: a small batch
    dict used for shape inference."""
    key = jax.random.PRNGKey(seed)
    params = model.init(
        {"params": key, "dropout": key}, sample_batch, train=False
    )["params"]
    opt_state = tx.init(params)
    opt_state2 = tx2.init(params) if tx2 is not None else None
    return TrainState(params, opt_state, opt_state2)


def _make_labels(bsz: int, num_neg: int) -> jax.Array:
    return jnp.concatenate(
        [jnp.ones((bsz, 1), jnp.float32), jnp.zeros((bsz, num_neg), jnp.float32)],
        axis=1,
    )


def _model_batch(batch: dict, neg: jax.Array) -> dict:
    return {
        "target": batch["target"],
        "neg_samples": neg,
        "seq_d1": batch["seq_d1"],
        "seq_d2": batch["seq_d2"],
    }


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    dr_e_w: Optional[float] = None,
    c2dsr_w: Optional[float] = None,
) -> Callable:
    """Phase-A step: masked BCE (+ dr_e_w * loss_dr_e when DR,
    + c2dsr_w * contrastive infomax when C2DSR — train/c2dsr.py).

    Returns step(state, batch, pools, pool_sizes, key) -> (state, metrics).
    """
    is_dr = dr_e_w is not None
    is_c2dsr = c2dsr_w is not None

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, pools, pool_sizes, key):
        k_neg, k_drop, k_corr, k_drop2 = jax.random.split(key, 4)
        neg = sample_negatives(
            k_neg, pools, pool_sizes, batch["domain_id"], batch["reject"], 1,
            batch.get("reject_counts"),
        )
        labels = _make_labels(batch["target"].shape[0], 1)
        views = None
        if is_c2dsr:
            from amid_tpu.train.c2dsr import c2dsr_views, sample_corr

            corr = sample_corr(k_corr, pools, pool_sizes, batch)
            views = c2dsr_views(batch, corr)

        def loss_fn(params):
            out = model.apply(
                {"params": params},
                _model_batch(batch, neg),
                train=True,
                rngs={"dropout": k_drop},
            )
            loss_cls = losses.masked_bce_loss(
                out["logits_d1"], out["logits_d2"], labels, batch["domain_id"]
            )
            metrics = {"loss_cls": loss_cls}
            loss = loss_cls
            if is_dr:
                dr_e = losses.dr_e_loss(out, labels, batch["domain_id"])
                loss = loss_cls + dr_e * dr_e_w
                metrics["loss_dr_e"] = dr_e
            if is_c2dsr:
                from amid_tpu.train.c2dsr import c2dsr_loss

                cl = c2dsr_loss(
                    model, params, _model_batch(batch, neg), views,
                    out["u_d1"], out["u_d2"], k_drop2, train=True,
                )
                loss = loss + cl * c2dsr_w
                metrics["loss_cl"] = cl
            metrics["loss"] = loss
            return loss, metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["nonfinite"] = nonfinite_flag(metrics)
        return TrainState(params, opt_state, state.opt_state2), metrics

    return step


def nonfinite_flag(metrics: dict) -> jax.Array:
    """1.0 if any loss metric is non-finite, else 0.0 — computed inside the
    step's XLA program so the host latch (loop.py) sees EVERY step, not just
    log steps (failure detection, SURVEY §5)."""
    flags = [(~jnp.isfinite(v)).astype(jnp.float32) for v in metrics.values()]
    return jnp.max(jnp.stack(flags))


def make_dr_r_step(model, tx2: optax.GradientTransformation) -> Callable:
    """Phase-B step (train_sr_dr.py:363-403): trains imputation/propensity
    heads on observed+unobserved rows with optimizer2."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, pools, pool_sizes, key):
        k_neg, k_drop = jax.random.split(key)
        neg = sample_negatives(
            k_neg, pools, pool_sizes, batch["domain_id"], batch["reject"], 1,
            batch.get("reject_counts"),
        )
        labels = _make_labels(batch["target"].shape[0], 1)

        def loss_fn(params):
            out = model.apply(
                {"params": params},
                _model_batch(batch, neg),
                train=True,
                rngs={"dropout": k_drop},
            )
            loss = losses.dr_r_loss(
                out, labels, batch["domain_id"], batch["ob_label"]
            )
            return loss, {"loss_dr_r": loss}

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state2 = tx2.update(grads, state.opt_state2, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["nonfinite"] = nonfinite_flag(metrics)
        return TrainState(params, state.opt_state, opt_state2), metrics

    return step


def make_eval_step(model, num_neg: int, jit: bool = True) -> Callable:
    """Eval pass (test(), train_sr.py:31-128): forward with num_neg sampled
    negatives, masked BCE val loss, on-device positive ranks (fixed & raw
    tie-break variants). jit=False returns the traceable body (used inside
    make_scanned_eval's lax.scan)."""

    def step(params, batch, pools, pool_sizes, key):
        neg = sample_negatives(
            key, pools, pool_sizes, batch["domain_id"], batch["reject"], num_neg,
            batch.get("reject_counts"),
        )
        labels = _make_labels(batch["target"].shape[0], num_neg)
        out = model.apply({"params": params}, _model_batch(batch, neg), train=False)
        loss_cls = losses.masked_bce_loss(
            out["logits_d1"], out["logits_d2"], labels, batch["domain_id"]
        )
        # choose_predict (utils.py:21-32): the active domain's scores
        dom = batch["domain_id"][:, None]
        pred = jnp.where(dom == 0, out["logits_d1"], out["logits_d2"])
        return {
            "loss_cls": loss_cls,
            "ranks_fixed": positive_ranks(pred, fix=True),
            "ranks_raw": positive_ranks(pred, fix=False),
        }

    return jax.jit(step) if jit else step


def make_resident_chunk_runner(
    step, batch_size: int, batch_sharding=None
) -> Callable:
    """A contiguous chunk of train steps as ONE device program over the
    DEVICE-RESIDENT dataset (the scanned-train fast path, cfg.fast_train):
    lax.scan carries the TrainState; the full per-row arrays live on
    device once per seed and each scanned step gathers its batch as
    `arrays[perm[i*bs:(i+1)*bs]]` from the epoch's 4-byte/row permutation
    — nothing but the permutation and a few metric scalars cross the
    (~26 ms-RTT) tunnel per epoch. The permutation is drawn by
    BatchIterator's host rng (epoch_perm()) and per-step keys fold the
    GLOBAL step index into the epoch key exactly as the host loop does
    (fold_in(ekey, i)), so batch streams and rng draws are identical to
    per-step dispatch — exact metric parity on CPU (test_fast_train, 1e-6
    over full runs). On TPU, XLA compiles the scanned body as a different
    program than the standalone step, so trajectories drift at float
    rounding level (first logged losses agree to ~1e-5; drift grows with
    training feedback but stays far below seed noise; the on-chip
    resident-vs-stacked drive reproduced the committed train100 trajectory
    to 4 decimals through 2 epochs). The returned
    (state, first-step metrics, nonfinite-latch-max) reproduces the loop's
    log-at-chunk-start sampling and its per-log-step NaN check window; one
    compiled program per distinct chunk length (the epoch tail recompiles
    once).

    run_chunk(state, arrays, perm, pools, pool_sizes, base_key, kidxs,
    bidxs) where arrays = {k: [n, ...]} device-resident, perm [nb*bs]
    int32, kidxs [chunk] = key-fold step indices (phase B offsets these by
    20_000 — loop.py), bidxs [chunk] = batch positions 0..nb-1 within the
    epoch (row addressing).

    batch_sharding (mesh runs): the resident arrays stay REPLICATED on
    every device (the permutation gather addresses arbitrary rows, so
    row-sharding them would turn each step's gather into an all-to-all);
    the gathered batch is constrained to the `data`-axis sharding instead,
    so every op downstream of the gather partitions exactly as the
    per-step mesh path does — each device gathers from its full local
    copy and keeps only its batch shard, zero collectives added."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_chunk(state, arrays, perm, pools, pool_sizes, base_key,
                  kidxs, bidxs):
        def body(s, xs):
            ki, bi = xs
            rows = jax.lax.dynamic_slice(
                perm, (bi * batch_size,), (batch_size,)
            )
            b = {k: jnp.take(v, rows, axis=0) for k, v in arrays.items()}
            if batch_sharding is not None:
                b = jax.lax.with_sharding_constraint(
                    b, jax.tree_util.tree_map(lambda _: batch_sharding, b)
                )
            s2, m = step(s, b, pools, pool_sizes,
                         jax.random.fold_in(base_key, ki))
            return s2, m

        state, ms = jax.lax.scan(body, state, (kidxs, bidxs))
        nf = (
            ms.pop("nonfinite").max()
            if "nonfinite" in ms
            else jnp.zeros((), jnp.float32)
        )
        m0 = jax.tree_util.tree_map(lambda x: x[0], ms)
        return state, m0, nf

    return run_chunk


def make_scanned_eval(model, num_neg: int, out_shardings=None) -> Callable:
    """The WHOLE eval pass as one compiled program (TPU-native rewrite of
    the per-batch loop): `lax.scan` of the eval step over the stacked val
    batches. The val loader is deterministic (shuffle=False,
    drop_last=True — train_sr.py:454-455), so the batches are stacked ONCE
    per seed and live on device; per epoch only `key` changes and the host
    dispatches a single program instead of `nb` steps built from freshly
    sliced numpy. Per-batch keys are `fold_in(key, i)` with the same i as
    the loop path, so negative draws — and therefore metrics — are
    IDENTICAL (test_fast_eval pins this).

    Returns eval_all(params, batches, pools, pool_sizes, key) ->
    {loss_cls: [nb], ranks_fixed: [nb, B], ranks_raw: [nb, B]}.

    out_shardings (multi-process mesh runs): force the outputs replicated
    so every process can read the full rank vectors for host
    accumulation."""
    body_step = make_eval_step(model, num_neg, jit=False)
    jit_kw = {} if out_shardings is None else {"out_shardings": out_shardings}

    @functools.partial(jax.jit, **jit_kw)
    def eval_all(params, batches, pools, pool_sizes, key):
        nb = next(iter(batches.values())).shape[0]

        def body(_, xs):
            batch, i = xs
            out = body_step(params, batch, pools, pool_sizes,
                            jax.random.fold_in(key, i))
            return None, (
                out["loss_cls"], out["ranks_fixed"], out["ranks_raw"]
            )

        _, (loss_cls, rf, rr) = jax.lax.scan(
            body, None, (batches, jnp.arange(nb))
        )
        return {"loss_cls": loss_cls, "ranks_fixed": rf, "ranks_raw": rr}

    return eval_all
