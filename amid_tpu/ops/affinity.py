"""Batch-affinity contraction for InnerComp / InterComp.

The reference materializes a [b, b, n, n] all-pairs score tensor
(model_seq.py:462-465, 489-490) — O(b^2 n^2) memory — to compute

    A[b, c] = max_{i, j}  seq_b[i] . seq_c[j]

Here the contraction is computed blocked: chunks of query rows are matmul'ed
against the flattened peer bank and max-reduced immediately, so peak memory is
O(chunk * B * n * m) and the matmuls are MXU-shaped. A Pallas kernel
(amid_tpu.ops.pallas_affinity) implements the same contraction fully fused;
this module is the XLA reference path and the dispatch point.

The peer *message* itself never needs the 4-D tensor at all: with
P_c = seq_c @ Wn^T, the reference's masked trans_nn + trans_bs pipeline
(model_seq.py:468-470) reduces algebraically to

    msg[b] = sum_c (w_bs[c] * M[b, c]) * P_c  +  (sum_c w_bs[c]) * b_nn + b_bs

i.e. a [B, B] x [B, n*d] matmul — see amid_tpu.models.comp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def max_affinity_xla(
    seq_a: jax.Array, seq_b: jax.Array, chunk: int = 8
) -> jax.Array:
    """A[b, c] = max_{i,j} seq_a[b, i] . seq_b[c, j].

    seq_a: [B, N, D], seq_b: [C, M, D] -> [B, C] float32.
    Blocked over the B axis to bound peak memory at chunk*C*N*M floats.
    """
    bsz, n, d = seq_a.shape
    c, m, _ = seq_b.shape
    if bsz % chunk != 0:
        chunk = 1
    y = seq_b.reshape(c * m, d)

    def one_chunk(a_chunk):  # [chunk, N, D]
        s = jnp.einsum(
            "bnd,kd->bnk", a_chunk, y, preferred_element_type=jnp.float32
        )  # [chunk, N, C*M]
        s = s.reshape(chunk, n, c, m)
        return jnp.max(s, axis=(1, 3))  # [chunk, C]

    a_blocks = seq_a.reshape(bsz // chunk, chunk, n, d)
    out = jax.lax.map(one_chunk, a_blocks)  # [B/chunk, chunk, C]
    return out.reshape(bsz, c)


def diag_max_affinity(seq_a: jax.Array, seq_b: jax.Array) -> jax.Array:
    """a[j] = max_{i,k} seq_a[j, i] . seq_b[j, k]  — per-user diagonal affinity.

    This is what the reference *actually* computes: in
    `torch.matmul(seq_self [b,n,d], seq1 [b,b,d,n])` (model_seq.py:462-465,
    487-490) torch aligns the 3-D operand to the SECOND batch dim of the 4-D
    one, so `group_bool[i, j] = seq_self[j] @ seq_peer[j].T` — independent of
    i. The affinity row is the same for every user: a per-peer broadcast of
    each user's own (self- or cross-domain) max affinity. O(B n m d) — far
    cheaper than the all-pairs contraction.

    seq_a: [B, N, D], seq_b: [B, M, D] -> [B] float32.
    """
    s = jnp.einsum(
        "bnd,bmd->bnm", seq_a, seq_b, preferred_element_type=jnp.float32
    )
    return jnp.max(s, axis=(1, 2))


@functools.partial(jax.jit, static_argnames=("kernels",))
def max_affinity(seq_a: jax.Array, seq_b: jax.Array, kernels: str = "xla") -> jax.Array:
    """Dispatch point for the affinity contraction.

    Measured on v5e (tools/bench_kernels.py): XLA fuses the max reduction
    into the blocked matmul and reaches ~115 TF/s (58% of bf16 SOL) at
    B=256, N=M=160 — the per-pair Pallas kernel (pallas_affinity) is
    loop-overhead-bound at ~20 TF/s. XLA is therefore the production path at
    every AMID shape; 'force_pallas' exists for kernel development.
    """
    if kernels == "force_pallas":
        from amid_tpu.ops.pallas_affinity import (
            max_affinity_pallas, max_affinity_pallas_smalln, smalln_fits,
        )

        bsz, n, d = seq_a.shape
        c, m, _ = seq_b.shape
        if smalln_fits(bsz, n, c, m, d):
            return max_affinity_pallas_smalln(seq_a, seq_b)
        return max_affinity_pallas(seq_a, seq_b)
    return max_affinity_xla(seq_a, seq_b)
