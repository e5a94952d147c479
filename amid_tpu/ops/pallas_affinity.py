"""Pallas TPU kernel for the batch max-affinity contraction.

    A[b, c] = max_{i, j} seq_a[b, i] . seq_b[c, j]

This is AMID's InnerComp/InterComp gating contraction (the reference
materializes the [b, b, n, n] score tensor — model_seq.py:462-465). The XLA
fallback (amid_tpu.ops.affinity) must stream [chunk, N, C, M] intermediates
through HBM, which makes the op memory-bound (~4x off roofline at amazon
shapes). This kernel keeps every [N, M] score block in VMEM and reduces it to
one scalar on the fly, so the op runs at MXU compute bound:

  grid (B/TB, C/TC) with TB=8, TC=128 (the fp32 min output tile);
  per cell: a_tile [TB, N, D] and b_tile [TC, M, D] live in VMEM; an inner
  fori over the TC peers does dot([N, D], [M, D]^T) -> max -> lane-insert
  into the output row via where(lane_iota == q).

FLOPs 2 B C N M D; bytes ~ (B N D) * C/TC + (C M D) * B/TB — compute-bound
for N, M >~ 64. For small N*M (mybank's seq_len 20) the matmuls underfill the
128x128 MXU tile, and the XLA path is already sub-millisecond — the
`max_affinity` dispatcher picks per shape.

Forward only: the hard gate built from A passes no gradient
(getBinaryTensor, model_seq.py:445-448), so A needs no VJP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TB = 8
_TC = 128


def _affinity_kernel(a_ref, b_ref, o_ref):
    # a_ref [TB, N, D] bf16; b_ref [TC, M, D] bf16; o_ref [TB, TC] f32
    tb = a_ref.shape[0]
    tc = b_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tc), 1)
    for p in range(tb):
        a_p = a_ref[p]  # [N, D]

        def body(q, row):
            s = jax.lax.dot_general(
                a_p,
                b_ref[q],  # [M, D]
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [N, M]
            return jnp.where(lane == q, jnp.max(s), row)

        row = jax.lax.fori_loop(
            0, tc, body, jnp.full((1, tc), -jnp.inf, jnp.float32)
        )
        o_ref[p, :] = row[0]


def _pad_batch(x: jax.Array, mult: int) -> jax.Array:
    rem = (-x.shape[0]) % mult
    if rem:
        # Pad with the first row; padded outputs are sliced away.
        pad = jnp.broadcast_to(x[:1], (rem,) + x.shape[1:])
        x = jnp.concatenate([x, pad], axis=0)
    return x


@jax.jit
def max_affinity_pallas(seq_a: jax.Array, seq_b: jax.Array) -> jax.Array:
    """seq_a: [B, N, D], seq_b: [C, M, D] -> [B, C] float32.

    Inputs are cast to bf16 (fp32 accumulation on the MXU) — halves the VMEM
    tile footprint and doubles MXU rate; the TPU XLA path computes these
    matmuls at reduced precision by default as well."""
    bsz, n, d = seq_a.shape
    c, m, _ = seq_b.shape
    a = _pad_batch(seq_a, _TB).astype(jnp.bfloat16)
    b = _pad_batch(seq_b, _TC).astype(jnp.bfloat16)
    bp, cp = a.shape[0], b.shape[0]

    out = pl.pallas_call(
        _affinity_kernel,
        grid=(bp // _TB, cp // _TC),
        in_specs=[
            pl.BlockSpec((_TB, n, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TC, m, d), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TB, _TC), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, cp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * cp * n * m * d,
            bytes_accessed=(bp * n * d * (cp // _TC) + cp * m * d * (bp // _TB))
            * a.dtype.itemsize,
            transcendentals=0,
        ),
    )(a, b)
    return out[:bsz, :c]


# ---- small-N variant: peer bank resident in VMEM --------------------------
#
# At mybank shapes (N=M=20) the blocked kernel above underfills the MXU and
# XLA's path is HBM-bound on the [B*N, C*M] score intermediate (104 MB at
# B=C=256 — measured ~1.13 ms, ~237 GB/s effective, for a 6.7 GFLOP
# contraction). This variant never materializes the scores in HBM: inputs
# are pre-transposed to time-major ([N, B, D] / flattened [M*C, D]) so the
# grid runs over the query time axis; each cell does ONE [B, D] x [D, M*C]
# matmul in VMEM, max-reduces the M contiguous C-wide column groups, and
# max-accumulates into the resident [B, C] output block.
#
# VMEM: bank M*C*D + scores B*M*C + out B*C (fp32) — fits under ~12 MB for
# N*M <= ~1k at B=C=256, D=128 (mybank: 7.9 MB). Dispatched from
# ops/affinity.py::max_affinity under kernels='force_pallas' when
# smalln_fits() holds (inputs are cast to bf16 — a numerics change, so the
# production 'pallas'/'auto' path stays on XLA until the measured win is
# recorded in docs/PERF.md; bench entry: tools/bench_kernels.py affinity).

_SMALLN_VMEM_BUDGET = 12 * 1024 * 1024


def _affinity_smalln_kernel(m, a_ref, b_ref, o_ref):
    # a_ref [1, B, D]; b_ref [M*C, D]; o_ref [B, C]
    p = pl.program_id(0)
    c = o_ref.shape[1]
    s = jax.lax.dot_general(
        a_ref[0], b_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, M*C]
    acc = s[:, :c]
    for q in range(1, m):
        acc = jnp.maximum(acc, s[:, q * c:(q + 1) * c])

    @pl.when(p == 0)
    def _init():
        o_ref[...] = acc

    @pl.when(p > 0)
    def _acc():
        o_ref[...] = jnp.maximum(o_ref[...], acc)


def smalln_fits(bsz: int, n: int, c: int, m: int, d: int) -> bool:
    bank = m * c * d * 2  # bf16
    scores = bsz * m * c * 4
    out = bsz * c * 4
    return bank + scores + out + bsz * d * 2 <= _SMALLN_VMEM_BUDGET


@jax.jit
def max_affinity_pallas_smalln(seq_a: jax.Array, seq_b: jax.Array) -> jax.Array:
    """seq_a: [B, N, D], seq_b: [C, M, D] -> [B, C] float32. Small-N/M path;
    caller must check smalln_fits()."""
    bsz, n, d = seq_a.shape
    c, m, _ = seq_b.shape
    at = seq_a.transpose(1, 0, 2).astype(jnp.bfloat16)  # [N, B, D]
    bt = seq_b.transpose(1, 0, 2).reshape(m * c, d).astype(jnp.bfloat16)
    return pl.pallas_call(
        functools.partial(_affinity_smalln_kernel, m),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, bsz, d), lambda p: (p, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m * c, d), lambda p: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bsz, c), lambda p: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * c * n * m * d,
            bytes_accessed=(n * bsz * d + m * c * d + bsz * c * 2) * 2,
            transcendentals=0,
        ),
    )(at, bt)
