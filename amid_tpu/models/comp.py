"""AMID multi-interest discovery / message-passing modules.

InnerComp (model_seq.py:450-472): intra-domain — each user's sequence
exchanges messages with co-interested peers *within the global batch*.
InterComp (model_seq.py:474-497): identical mechanism, but affinity and
messages come from the peers' other-domain sequences.

TWO affinity semantics, selected by `broadcast_quirk`:

**broadcast_quirk=True (default — what the reference actually computes).**
In `torch.matmul(seq_self [b,n,d], seq1 [b,b,d,n])` (model_seq.py:462-465,
487-490) torch broadcast aligns the 3-D operand to the *second* batch dim, so
`group_bool[i, j] = seq_self[j] @ seq_peer[j].T` — independent of i. Verified
empirically against the reference modules (tests/test_comp.py torch oracle).
Consequently:

  a[j]     = max_{p,q} seq_self[j][p] . seq_peer[j][q]   (per-user DIAGONAL)
  g        = 1[softmax_j(a) > threshold]                 (shared gate vector)
  msg      = sum_j (w_bs[j] g[j]) P_j + (sum_j w_bs[j]) b_nn + b_bs

— ONE shared [m, d] message broadcast to every user in the batch. For
InnerComp a[j] is user j's max self-affinity; for InterComp it is the max
affinity between user j's own d1 and d2 sequences. This is cheaper than the
all-pairs reading: O(B n m d) affinity, one shared matvec message.

**broadcast_quirk=False (idealized pairwise mode).** The non-degenerate
reading the round-1 build shipped — plausibly what the paper *describes*:

  A[b, c]  = max_{i,j} seq_b[i] . peer_c[j]          (blocked contraction /
                                                      Pallas kernel)
  S        = softmax_c(A)                            (model_seq.py:466)
  M[b, c]  = 1[S > threshold]                        (hard gate, no gradient
                                                      through A — matches
                                                      getBinaryTensor,
                                                      model_seq.py:445-448)
  P_c      = peer_c @ Wn^T                           (trans_nn sans bias)
  msg[b]   = sum_c (w_bs[c] M[b,c]) P_c + (sum_c w_bs[c]) b_nn + b_bs

Both modes share the algebraic factorization of the reference's
mask -> trans_nn -> trans_bs pipeline (model_seq.py:468-470), including the
quirk that trans_nn's bias leaks through masked-out peers (trans_nn is applied
*after* masking there, so trans_nn(0) = b_nn still reaches trans_bs).

`w_bs` is Linear(bs, 1) — the batch size is baked into a weight
(model_seq.py:457), which forces a fixed global batch with drop_last, exactly
as in the reference. On a sharded batch the contraction runs over the
*global* batch axis: under pjit/GSPMD the einsum over `c` induces an
all-gather of the per-shard peer banks over the `data` mesh axis — the
batch-axis analogue of sequence-parallel attention (SURVEY.md §2.5).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from amid_tpu.ops.affinity import diag_max_affinity, max_affinity


class PeerMessage(nn.Module):
    """Shared mechanism of InnerComp/InterComp: affinity-gated peer
    aggregation. Returns the aggregated peer message [B, M, D]."""

    batch_size: int
    threshold: float
    kernels: str = "xla"
    broadcast_quirk: bool = True

    @nn.compact
    def __call__(self, seq_self: jax.Array, seq_peer: jax.Array) -> jax.Array:
        d = seq_self.shape[-1]
        bs = self.batch_size
        bound_nn = 1.0 / math.sqrt(d)
        bound_bs = 1.0 / math.sqrt(bs)

        def uinit(bound):
            def init(key, shape, dtype=jnp.float32):
                return jax.random.uniform(key, shape, dtype, -bound, bound)

            return init

        w_nn = self.param("trans_nn_kernel", uinit(bound_nn), (d, d))
        b_nn = self.param("trans_nn_bias", uinit(bound_nn), (d,))
        w_bs = self.param("trans_bs_kernel", uinit(bound_bs), (bs,))
        b_bs = self.param("trans_bs_bias", uinit(bound_bs), (1,))

        # Inside a shard_map SPMD region the batch is sharded over `data`;
        # the contraction is over the GLOBAL batch, so gather the peer bank
        # explicitly (rows of the affinity/gate stay local).
        from amid_tpu.parallel import context

        ctx = context.current()
        if self.broadcast_quirk:
            # Reference semantics (model_seq.py:462-470 under torch
            # broadcast): diagonal affinity, one shared gate vector, one
            # shared [m, d] message for the whole batch. The diagonal pairs
            # (seq_self[j], seq_peer[j]) are co-located per user, so under
            # SPMD the [b_local] affinity is computed locally and only the
            # tiny vector + the peer bank are gathered.
            aff = diag_max_affinity(seq_self, seq_peer)  # [b_local]
            if ctx is not None:
                aff = jax.lax.all_gather(
                    aff, ctx.data_axis, axis=0, tiled=True
                )  # [B] — same shard order as the peer-bank gather below
                seq_peer = jax.lax.all_gather(
                    seq_peer, ctx.data_axis, axis=0, tiled=True
                )
            gate = jax.nn.softmax(aff, axis=0)
            adj = jnp.where(gate > self.threshold, 1.0, 0.0)  # hard gate
            peer_proj = jnp.einsum(
                "cmd,de->cme", seq_peer, w_nn, preferred_element_type=jnp.float32
            )
            msg = jnp.einsum(
                "c,cme->me",
                adj * w_bs,
                peer_proj,
                preferred_element_type=jnp.float32,
            )
            msg = msg + jnp.sum(w_bs) * b_nn + b_bs
            return jnp.broadcast_to(
                msg[None], (seq_self.shape[0],) + msg.shape
            )

        # Idealized pairwise mode. Inside a shard_map SPMD region the batch is
        # sharded over `data`; the contraction is over the GLOBAL batch, so
        # gather the peer bank explicitly (rows of the affinity/gate stay
        # local).
        if ctx is not None:
            seq_peer = jax.lax.all_gather(
                seq_peer, ctx.data_axis, axis=0, tiled=True
            )

        aff = max_affinity(seq_self, seq_peer, kernels=self.kernels)  # [b_l, B]
        gate = jax.nn.softmax(aff, axis=1)
        adj = jnp.where(gate > self.threshold, 1.0, 0.0)  # hard gate, no grad to aff

        peer_proj = jnp.einsum(
            "cmd,de->cme", seq_peer, w_nn, preferred_element_type=jnp.float32
        )
        msg = jnp.einsum(
            "bc,cme->bme",
            adj * w_bs[None, :],
            peer_proj,
            preferred_element_type=jnp.float32,
        )
        return msg + jnp.sum(w_bs) * b_nn + b_bs


class InnerComp(nn.Module):
    """Intra-domain peer message passing; doubles the time axis
    (model_seq.py:471: concat along time)."""

    batch_size: int
    threshold: float
    kernels: str = "xla"
    broadcast_quirk: bool = True

    @nn.compact
    def __call__(self, seq: jax.Array) -> jax.Array:
        msg = PeerMessage(
            self.batch_size, self.threshold, self.kernels, self.broadcast_quirk
        )(seq, seq)
        return jnp.concatenate([seq, msg], axis=1)


class InterComp(nn.Module):
    """Cross-domain peer message passing: information flows seq_peer -> seq_self
    (model_seq.py:483-497); applied symmetrically twice by the caller."""

    batch_size: int
    threshold: float
    kernels: str = "xla"
    broadcast_quirk: bool = True

    @nn.compact
    def __call__(self, seq_self: jax.Array, seq_peer: jax.Array) -> jax.Array:
        msg = PeerMessage(
            self.batch_size, self.threshold, self.kernels, self.broadcast_quirk
        )(seq_self, seq_peer)
        return jnp.concatenate([seq_self, msg], axis=1)
