"""Pallas TPU scatter kernel for unique-row table updates (PRODUCTION on the
lazy path under kernels=pallas/auto).

Built for the lazy-table-Adam path (train/lazy.py), which scatters SORTED
UNIQUE ids (jnp.unique output, out-of-range sentinel tail): because the ids
are unique, `at[uids].add(-upd)` equals a pure `at[uids].set(rows - upd)`,
so a race-free per-row-DMA kernel is possible. The table buffer is
input-output aliased (donated), ids are scalar-prefetched to SMEM, and each
grid cell issues one async VMEM->HBM row DMA per update row (all in flight
before the first wait). Sentinel rows (id >= V, `mode="drop"` semantics)
are skipped with `pl.when`.

Measurement history (v5e, docs/PERF.md "scatter study"):
* standalone (carry-chained loops): this kernel is DMA-ISSUE-bound at
  ~310 ns/row — independent of row width (512 B..1.5 KB), per-cell tile
  size (16..512) and semaphore strategy — vs XLA's standalone scatter at
  ~380 ns/row.
* a fused [V, 3, D] param+mu+nu layout (one DMA per touched row) loses
  ~2.4 ms/step to XLA's slow 3-D gather path (~250 ns/row vs 34 ns/row for
  2-D row gathers); hot tables stay 2-D.
* in-step A/B, idle host, RTT-corrected (2026-08-20, tools/perf_pass.py,
  results/perf_pass.json): the flagship lazy step runs 6.83 ms/step with
  XLA scatters vs 5.27 ms/step with this kernel (37.5k -> 48.6k ex/s), so
  train/lazy.py DISPATCHES it whenever kernels resolves to "pallas" (the
  TPU default via "auto"). An earlier contended-host measurement
  (2026-08-18) had concluded the opposite; the idle-host A/B supersedes it.

Also the explicit-DMA scatter formulation the sharded serving path can
extend with remote DMAs (mirror of pallas_embedding.py's gather); exercised
by tests/test_pallas_scatter.py and tools/bench_kernels.py.

Reference behavior context: the sparse-embedding update of the reference is
torch dense-grad Adam (train_sr.py:173-208); the TPU-side lazy optimizer and
this kernel are new.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TN = 16  # rows written per grid cell


def _scatter_kernel(v, ids_ref, upd_ref, table_in_ref, table_ref, sems):
    del table_in_ref  # aliased to table_ref (the output)
    i = pl.program_id(0)
    tn = upd_ref.shape[0]
    # start all row DMAs, then wait — overlaps the row writes
    for p in range(tn):
        @pl.when(ids_ref[i * tn + p] < v)
        def _start(p=p):
            pltpu.make_async_copy(
                upd_ref.at[p], table_ref.at[ids_ref[i * tn + p]], sems.at[p]
            ).start()
    for p in range(tn):
        @pl.when(ids_ref[i * tn + p] < v)
        def _wait(p=p):
            pltpu.make_async_copy(
                upd_ref.at[p], table_ref.at[ids_ref[i * tn + p]], sems.at[p]
            ).wait()


def _scatter3_kernel(v, ids_ref, t_ref, m_ref, n_ref,
                     tbl_in, mu_in, nu_in, tbl, mu, nu, sems):
    del tbl_in, mu_in, nu_in  # aliased to the outputs
    i = pl.program_id(0)
    tn = t_ref.shape[0]
    pairs = ((t_ref, tbl, 0), (m_ref, mu, 1), (n_ref, nu, 2))
    # issue all 3*TN row DMAs before the first wait — one shared in-flight
    # window instead of three sequential kernels' issue/wait horizons
    for p in range(tn):
        for src, dst, s in pairs:
            @pl.when(ids_ref[i * tn + p] < v)
            def _start(p=p, src=src, dst=dst, s=s):
                pltpu.make_async_copy(
                    src.at[p], dst.at[ids_ref[i * tn + p]], sems.at[s, p]
                ).start()
    for p in range(tn):
        for src, dst, s in pairs:
            @pl.when(ids_ref[i * tn + p] < v)
            def _wait(p=p, src=src, dst=dst, s=s):
                pltpu.make_async_copy(
                    src.at[p], dst.at[ids_ref[i * tn + p]], sems.at[s, p]
                ).wait()


def scatter_set_unique3_pallas(
    table: jax.Array, mu: jax.Array, nu: jax.Array, ids: jax.Array,
    t_rows: jax.Array, m_rows: jax.Array, n_rows: jax.Array,
    *, interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused `at[ids].set(...)` over the three lazy-Adam arrays (UNIQUE ids,
    same contract as scatter_set_unique_pallas). One kernel issues all
    3 x N row DMAs — measured A/B vs three kernel calls in docs/PERF.md."""
    v, d = table.shape
    n = ids.shape[0]
    n_pad = -(-n // _TN) * _TN
    ids_p = jnp.pad(ids, (0, n_pad - n), constant_values=v)
    pad = lambda r: jnp.pad(r, ((0, n_pad - n), (0, 0)))  # noqa: E731
    return pl.pallas_call(
        functools.partial(_scatter3_kernel, v),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pad // _TN,),
            in_specs=[
                pl.BlockSpec((_TN, d), lambda i, ids: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_TN, d), lambda i, ids: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_TN, d), lambda i, ids: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[pltpu.SemaphoreType.DMA((3, _TN))],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(table.shape, table.dtype),
            jax.ShapeDtypeStruct(mu.shape, mu.dtype),
            jax.ShapeDtypeStruct(nu.shape, nu.dtype),
        ],
        input_output_aliases={4: 0, 5: 1, 6: 2},  # ids count as input 0
        interpret=interpret,
    )(ids_p, pad(t_rows), pad(m_rows), pad(n_rows), table, mu, nu)


def scatter_set_unique_pallas(
    table: jax.Array, ids: jax.Array, rows: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """`table.at[ids].set(rows, mode="drop")` for UNIQUE ids.

    table [V, D] (D <= 128) or [V, K, D]; ids [N] int32, duplicate-free
    (out-of-range = dropped); rows [N, ...] matching the table's row shape.
    The caller owns the uniqueness contract — duplicate ids are a data race
    (any one of the duplicate rows wins, nondeterministically). The table
    buffer is donated (aliased to the output).
    """
    v, *row_shape = table.shape
    n = ids.shape[0]
    if len(row_shape) == 1 and row_shape[0] > 128:
        # wide 2D: correctness fallback (fast path needs native 3D storage;
        # see module docstring)
        return table.at[ids].set(rows, mode="drop")
    n_pad = -(-n // _TN) * _TN
    ids_p = jnp.pad(ids, (0, n_pad - n), constant_values=v)  # pad -> dropped
    rows_p = jnp.pad(rows, [(0, n_pad - n)] + [(0, 0)] * len(row_shape))
    zeros = (0,) * len(row_shape)
    return pl.pallas_call(
        functools.partial(_scatter_kernel, v),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_pad // _TN,),
            in_specs=[
                pl.BlockSpec((_TN, *row_shape), lambda i, ids: (i, *zeros),
                             memory_space=pltpu.VMEM),  # update rows
                pl.BlockSpec(memory_space=pl.ANY),   # table in HBM
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((_TN,))],
        ),
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        input_output_aliases={2: 0},  # donate the table (ids count as input 0)
        interpret=interpret,
    )(ids_p, rows_p, table)
