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
from amid_tpu.train.steps import TrainState, _make_labels, _model_batch


def param_specs(tree) -> object:
    """PartitionSpec pytree: item_embedding rows over `model`, rest replicated."""

    def rule(path, x):
        if "item_embedding" in _path_name(path) and getattr(x, "ndim", 0) == 2:
            return P(MODEL_AXIS, None)
        return P()

    return jax.tree_util.tree_map_with_path(rule, tree)


def make_spmd_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    dr_e_w: Optional[float] = None,
) -> Callable:
    """Returns step(state, batch, pools, pool_sizes, key) -> (state, metrics)
    operating on GLOBAL arrays (shard_map handles the partitioning)."""
    axes = SpmdAxes(
        data_axis=DATA_AXIS,
        model_axis=MODEL_AXIS,
        data_shards=mesh.shape[DATA_AXIS],
        model_shards=mesh.shape[MODEL_AXIS],
    )
    is_dr = dr_e_w is not None

    def local_step(state: TrainState, batch, pools, pool_sizes, key):
        with spmd(axes):
            # independent negatives/dropout per data shard
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
                loss_cls = jax.lax.pmean(
                    losses.masked_bce_loss(
                        out["logits_d1"], out["logits_d2"], labels,
                        batch["domain_id"],
                    ),
                    DATA_AXIS,
                )
                metrics = {"loss_cls": loss_cls}
                loss = loss_cls
                if is_dr:
                    dr_e = jax.lax.pmean(
                        losses.dr_e_loss(out, labels, batch["domain_id"]),
                        DATA_AXIS,
                    )
                    loss = loss_cls + dr_e * dr_e_w
                    metrics["loss_dr_e"] = dr_e
                metrics["loss"] = loss
                return loss, metrics

            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            # shard_map's AD already psums the cotangents of replicated
            # (in_spec P()) inputs over the mapped axes, and the table's
            # scatter-add cotangent over `data` likewise — grads arrive fully
            # reduced here (verified against the dense path in test_spmd).
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.opt_state2), metrics

    def specs_of_state(state):
        return TrainState(
            param_specs(state.params), param_specs(state.opt_state), None
        )

    @jax.jit
    def step(state, batch, pools, pool_sizes, key):
        state_specs = specs_of_state(state)
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
