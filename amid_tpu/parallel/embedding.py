"""Embedding lookup — replicated and row-sharded paths.

Reference semantics: a plain table gather (model_seq.py:25-29) on one GPU.
TPU build adds the model-parallel path for tables that don't fit (or
shouldn't be replicated) per chip: rows sharded over the ``model`` mesh axis.

Row-sharded lookup (mask-and-psum formulation):

  each model-axis shard holds rows [lo, hi); for a batch of ids it gathers
  `table_local[clip(id - lo)] * (lo <= id < hi)` and the partial results are
  summed with psum over the model axis. Exactly one shard contributes a
  non-zero row per id, so the psum reconstructs the gather. The backward pass
  (transpose of the masked gather + psum) is a masked scatter-add of the
  incoming cotangent into each shard's rows — XLA derives it automatically
  from this formulation, which keeps the 50M-row scatter-add local to the
  owning shard (SURVEY.md §7 "hard parts").

This trades an all-to-all routing scheme for one psum over [B, L, D] — on ICI
this is bandwidth-cheap for the AMID shapes and has no load-imbalance pathologies.
`embedding_lookup` is the dispatch point used inside the model; inside
shard_map it takes the *local* table shard plus the axis name.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def embedding_lookup(table: jax.Array, ids: jax.Array) -> jax.Array:
    """Dispatch point used inside the model. Plain gather under jit/GSPMD;
    inside a shard_map SPMD region (parallel.context) `table` is this
    shard's rows and the lookup becomes mask-and-psum over the model axis."""
    from amid_tpu.parallel import context

    lazy = context.current_lazy()
    if lazy is not None:
        uids, rows = lazy
        pos = jnp.searchsorted(uids, ids)
        return jnp.take(rows, pos, axis=0)

    ctx = context.current()
    if ctx is not None:
        # Run the masked-psum path even for a single model shard: the table
        # arrives with spec P(model, None) and shard_map's replication
        # tracker needs the psum to prove the result is model-replicated
        # (size-1 axes still count as "varying").
        return sharded_lookup(table, ids, ctx.model_axis, ctx.model_shards)
    return jnp.take(table, ids, axis=0)


def sharded_lookup(
    local_table: jax.Array,
    ids: jax.Array,
    axis_name: str,
    num_shards: int,
) -> jax.Array:
    """Row-sharded lookup inside shard_map.

    local_table: [V_local, D] — this shard's contiguous rows.
    ids: [...] global row indices (any shape).
    Returns [..., D] full embeddings (replicated over the model axis).
    """
    v_local = local_table.shape[0]
    shard = jax.lax.axis_index(axis_name)
    lo = shard * v_local
    local_ids = ids - lo
    mine = (local_ids >= 0) & (local_ids < v_local)
    safe = jnp.clip(local_ids, 0, v_local - 1)
    rows = jnp.take(local_table, safe, axis=0)
    rows = jnp.where(mine[..., None], rows, 0.0)
    return jax.lax.psum(rows, axis_name)
