"""Pallas TPU embedding-gather kernel.

Gathers rows of a large HBM-resident table by id: ids are scalar-prefetched
into SMEM (available before the kernel body runs), and each grid cell issues
one async DMA per row directly from the HBM table into its VMEM output
block — all `TN` row copies are in flight before the first wait, so the
gather runs at DMA-issue/HBM-row-fetch bound, the same regime as XLA's
native gather (which is already near this bound — see tools/bench_kernels;
this kernel exists as the explicit-DMA formulation the sharded serving path
can extend with remote DMAs).

Backward: gather's transpose is scatter-add, which is race-prone across grid
cells in a hand-written kernel (read-modify-write on shared HBM rows);
the custom_vjp routes it to XLA's segment-sum scatter, which is
memory-bound-optimal on v5e.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TN = 16  # rows gathered per grid cell


def _gather_kernel(ids_ref, table_ref, o_ref, sems):
    i = pl.program_id(0)
    tn = o_ref.shape[0]
    # start all row DMAs, then wait — overlaps the row fetches
    for p in range(tn):
        pltpu.make_async_copy(
            table_ref.at[ids_ref[i * tn + p]], o_ref.at[p], sems.at[p]
        ).start()
    for p in range(tn):
        pltpu.make_async_copy(
            table_ref.at[ids_ref[i * tn + p]], o_ref.at[p], sems.at[p]
        ).wait()


def _gather_pallas(table: jax.Array, flat_ids: jax.Array) -> jax.Array:
    n = flat_ids.shape[0]
    d = table.shape[1]
    n_pad = -(-n // _TN) * _TN
    ids_p = jnp.pad(flat_ids, (0, n_pad - n))  # pad with id 0
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pad // _TN,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # table in HBM
            out_specs=pl.BlockSpec((_TN, d), lambda i, ids: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((_TN,))],
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), table.dtype),
    )(ids_p, table)
    return out[:n]


@jax.custom_vjp
def embedding_gather_pallas(table: jax.Array, ids: jax.Array) -> jax.Array:
    """table [V, D], ids [...] int32 -> [..., D]."""
    flat = ids.reshape(-1)
    return _gather_pallas(table, flat).reshape(*ids.shape, table.shape[1])


def _fwd(table, ids):
    return embedding_gather_pallas(table, ids), (table.shape, ids)


def _bwd(res, g):
    import numpy as np

    (v, d), ids = res
    # scatter-add via XLA (race-free, memory-bound optimal)
    flat_ids = ids.reshape(-1)
    flat_g = g.reshape(-1, d)
    dtable = jnp.zeros((v, d), flat_g.dtype).at[flat_ids].add(flat_g)
    return dtable, np.zeros(ids.shape, jax.dtypes.float0)


embedding_gather_pallas.defvjp(_fwd, _bwd)
