"""Explicit-SPMD training step via shard_map (manual collectives).

The GSPMD path (plain jit + sharded arrays) lets XLA choose the collectives;
this path pins them down, which matters for the scale config (50M-row
tables), where a wrong GSPMD choice (e.g. all-gathering the table for the
gather) would be catastrophic:

* batch sharded over `data`; item table row-sharded over `model`; all other
  params + optimizer moments replicated.
* embedding lookup = local gather + psum over `model`
  (parallel.embedding.sharded_lookup via the SPMD context).
* InnerComp/InterComp = all_gather of the per-shard peer bank over `data`,
  affinity/gate rows stay local (models.comp via the SPMD context).
* loss = pmean over `data`; grads of replicated params psum automatically
  through shard_map's transpose; table grads stay shard-local (the
  scatter-add never crosses chips).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from amid_tpu.data.sampler import sample_negatives
from amid_tpu.parallel.context import SpmdAxes, spmd
from amid_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, _path_name
from amid_tpu.train import losses
from amid_tpu.train.metrics import positive_ranks
from amid_tpu.train.steps import (
    TrainState, _make_labels, _model_batch, nonfinite_flag,
)


def param_specs(tree) -> object:
    """PartitionSpec pytree: item_embedding rows over `model`, rest replicated."""

    def rule(path, x):
        if "item_embedding" in _path_name(path) and getattr(x, "ndim", 0) == 2:
            return P(MODEL_AXIS, None)
        return P()

    return jax.tree_util.tree_map_with_path(rule, tree)


def _axes_of(mesh: Mesh) -> SpmdAxes:
    return SpmdAxes(
        data_axis=DATA_AXIS,
        model_axis=MODEL_AXIS,
        data_shards=mesh.shape[DATA_AXIS],
        model_shards=mesh.shape[MODEL_AXIS],
    )


def _specs_of_state(state: TrainState) -> TrainState:
    return TrainState(
        param_specs(state.params),
        param_specs(state.opt_state),
        None if state.opt_state2 is None else param_specs(state.opt_state2),
    )


def _make_spmd_update_step(
    model, tx: optax.GradientTransformation, mesh: Mesh, loss_builder, slot: int
) -> Callable:
    """Shared shard_map update-step skeleton. loss_builder(out, labels,
    batch) -> (loss, metrics) computed on LOCAL shards (the builder must
    pmean over DATA_AXIS itself so every loss form controls its reduction);
    slot selects opt_state (1) or opt_state2 (2)."""
    axes = _axes_of(mesh)

    def local_step(state: TrainState, batch, pools, pool_sizes, key):
        with spmd(axes):
            # Independent negatives/dropout per data shard. No fold at 1
            # shard: a 1x1 mesh reproduces the single-device RNG stream
            # bit-for-bit (split(key,2)==split(key,4)[:2]), which is what
            # lets test_mesh_trainer assert METRIC equality between the
            # shard_map trainer and the plain trainer.
            if axes.data_shards > 1:
                key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
            k_neg, k_drop = jax.random.split(key)
            neg = sample_negatives(
                k_neg, pools, pool_sizes, batch["domain_id"], batch["reject"],
                1, batch.get("reject_counts"),
            )
            labels = _make_labels(batch["target"].shape[0], 1)

            def loss_fn(params):
                out = model.apply(
                    {"params": params},
                    _model_batch(batch, neg),
                    train=True,
                    rngs={"dropout": k_drop},
                )
                return loss_builder(out, labels, batch)

            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            # shard_map's AD already psums the cotangents of replicated
            # (in_spec P()) inputs over the mapped axes, and the table's
            # scatter-add cotangent over `data` likewise — grads arrive fully
            # reduced here (verified against the dense path in test_spmd).
            opt = state.opt_state if slot == 1 else state.opt_state2
            updates, opt_new = tx.update(grads, opt, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics["nonfinite"] = nonfinite_flag(metrics)
            new_state = TrainState(
                params,
                opt_new if slot == 1 else state.opt_state,
                state.opt_state2 if slot == 1 else opt_new,
            )
            return new_state, metrics

    @jax.jit
    def step(state, batch, pools, pool_sizes, key):
        state_specs = _specs_of_state(state)
        batch_specs = {k: P(DATA_AXIS) for k in batch}
        sharded = jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(state_specs, batch_specs, P(), P(), P()),
            out_specs=(state_specs, P()),
            check_vma=True,
        )
        return sharded(state, batch, pools, pool_sizes, key)

    return step


def make_spmd_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    dr_e_w: Optional[float] = None,
) -> Callable:
    """Phase-A step on GLOBAL arrays (shard_map handles the partitioning):
    masked BCE (+ dr_e_w * dr_e when DR), optimizer 1."""
    is_dr = dr_e_w is not None

    def loss_builder(out, labels, batch):
        loss_cls = jax.lax.pmean(
            losses.masked_bce_loss(
                out["logits_d1"], out["logits_d2"], labels, batch["domain_id"]
            ),
            DATA_AXIS,
        )
        metrics = {"loss_cls": loss_cls}
        loss = loss_cls
        if is_dr:
            dr_e = jax.lax.pmean(
                losses.dr_e_loss(out, labels, batch["domain_id"]), DATA_AXIS
            )
            loss = loss_cls + dr_e * dr_e_w
            metrics["loss_dr_e"] = dr_e
        metrics["loss"] = loss
        return loss, metrics

    return _make_spmd_update_step(model, tx, mesh, loss_builder, slot=1)


def make_spmd_dr_r_step(
    model, tx2: optax.GradientTransformation, mesh: Mesh
) -> Callable:
    """Phase-B step (train_sr_dr.py:363-403) under shard_map: imputation/
    propensity heads on observed+unobserved rows, optimizer2."""

    def loss_builder(out, labels, batch):
        loss = jax.lax.pmean(
            losses.dr_r_loss(out, labels, batch["domain_id"], batch["ob_label"]),
            DATA_AXIS,
        )
        return loss, {"loss_dr_r": loss}

    return _make_spmd_update_step(model, tx2, mesh, loss_builder, slot=2)


def make_spmd_eval_step(model, num_neg: int, mesh: Mesh) -> Callable:
    """Eval pass under shard_map (test(), train_sr.py:31-128): per-shard
    negative sampling + forward; ranks stay sharded over `data` (the host
    accumulator concatenates them), val loss is pmean'd."""
    axes = _axes_of(mesh)

    def local_eval(params, batch, pools, pool_sizes, key):
        with spmd(axes):
            if axes.data_shards > 1:  # see local_step: 1x1 == plain stream
                key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
            neg = sample_negatives(
                key, pools, pool_sizes, batch["domain_id"], batch["reject"],
                num_neg, batch.get("reject_counts"),
            )
            labels = _make_labels(batch["target"].shape[0], num_neg)
            out = model.apply(
                {"params": params}, _model_batch(batch, neg), train=False
            )
            loss_cls = jax.lax.pmean(
                losses.masked_bce_loss(
                    out["logits_d1"], out["logits_d2"], labels,
                    batch["domain_id"],
                ),
                DATA_AXIS,
            )
            dom = batch["domain_id"][:, None]
            pred = jnp.where(dom == 0, out["logits_d1"], out["logits_d2"])
            return {
                "loss_cls": loss_cls,
                "ranks_fixed": positive_ranks(pred, fix=True),
                "ranks_raw": positive_ranks(pred, fix=False),
            }

    @jax.jit
    def step(params, batch, pools, pool_sizes, key):
        out_specs = {
            "loss_cls": P(),
            "ranks_fixed": P(DATA_AXIS),
            "ranks_raw": P(DATA_AXIS),
        }
        sharded = jax.shard_map(
            local_eval,
            mesh=mesh,
            in_specs=(
                param_specs(params), {k: P(DATA_AXIS) for k in batch},
                P(), P(), P(),
            ),
            out_specs=out_specs,
            check_vma=True,
        )
        return sharded(params, batch, pools, pool_sizes, key)

    return step
