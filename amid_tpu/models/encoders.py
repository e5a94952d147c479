"""Sequence encoders: SASRec, BERT4Rec, GRU4Rec — TPU-native rebuilds.

Each encoder maps an embedded sequence [B, T, D] to contextualized features
[B, T, D]. Reference behaviors reproduced (with file:line cites); reference
*quirks* are reproduced deliberately and documented, because parity with the
published protocol is a goal:

* SASRec/Log2feats (model_seq.py:331-387): learned positional embedding,
  pre-LN on the attention *query only* (K/V are un-normalized, residual adds
  onto the normalized Q — model_seq.py:373-378), causal mask, attention-prob
  dropout 0.5, PointWiseFeedForward with residual. The reference's "timeline
  mask" tests the *embedded floats* against exact 0.0 (model_seq.py:365) —
  since pad_id embeddings are random normals this is a no-op, and we omit it.
* BERT4Rec (model_seq.py:221-245,277-298): pre-norm SublayerConnection with
  the hand-rolled LayerNorm, tanh-GELU FFN, key-padding mask built from
  `seq_d2 > 0` for BOTH domains (model_seq.py:286-294) — the d2-mask quirk is
  kept behind ModelConfig.bert_d2_mask_quirk. No positional embedding.
* GRU4Rec (model_seq.py:56-113): one GRU per domain, zero initial state.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from amid_tpu.ops.torch_compat import (
    RefLayerNorm,
    TorchGRU,
    TorchLayerNorm,
    TorchLinear,
    tanh_gelu,
    torch_embedding_init,
    xavier_uniform_init,
)

NEG_INF = -1e9  # reference mask fill value (model_seq.py:155)


# Fused pallas attention wins for T >= ~64 (measured v5e, tools/
# bench_kernels.py: T=160 fwd+bwd 2.26ms vs 3.86ms XLA; T=20 a wash) —
# below that XLA's fusion is already fine and kernel overhead dominates.
PALLAS_ATTN_MIN_T = 64


def _use_pallas_attention(kernels: str, t: int) -> bool:
    return kernels == "pallas" and t >= PALLAS_ATTN_MIN_T


def _dropout_seed(module: nn.Module, deterministic: bool, rate: float):
    """Derive a [1] int32 seed for in-kernel dropout from the flax rng."""
    if deterministic or rate == 0.0:
        return jnp.zeros((1,), jnp.int32), 0.0
    key = module.make_rng("dropout")
    seed = jax.random.randint(key, (1,), 0, jnp.iinfo(jnp.int32).max,
                              dtype=jnp.int32)
    return seed, rate


class TorchMultiheadAttention(nn.Module):
    """torch nn.MultiheadAttention equivalent (used by Log2feats,
    model_seq.py:348-351): fused in-proj with xavier-uniform init and zero
    bias, out-proj with Linear init and zero bias, dropout on attention
    probabilities. kernels='pallas' routes the attention core through the
    fused VMEM-resident kernel (amid_tpu.ops.pallas_attention)."""

    num_heads: int
    dropout: float
    kernels: str = "xla"

    @nn.compact
    def __call__(
        self,
        q: jax.Array,  # [B, Tq, D]
        k: jax.Array,
        v: jax.Array,
        attn_bias: Optional[jax.Array],  # additive [.., Tq, Tk] or None
        deterministic: bool,
    ) -> jax.Array:
        d = q.shape[-1]
        h = self.num_heads
        dh = d // h
        w_in = self.param("in_proj_kernel", xavier_uniform_init, (d, 3 * d))
        b_in = self.param("in_proj_bias", nn.initializers.zeros, (3 * d,))
        qp = q @ w_in[:, :d] + b_in[:d]
        kp = k @ w_in[:, d : 2 * d] + b_in[d : 2 * d]
        vp = v @ w_in[:, 2 * d :] + b_in[2 * d :]

        if _use_pallas_attention(self.kernels, q.shape[1]):
            from amid_tpu.ops.pallas_attention import fused_attention

            seed, rate = _dropout_seed(self, deterministic, self.dropout)
            bias = attn_bias if attn_bias is not None else jnp.zeros(
                (1, 1, 1, q.shape[1]), jnp.float32
            )
            out = fused_attention(qp, kp, vp, bias, seed, h, rate)
        else:

            def split(x):  # [B, T, D] -> [B, h, T, dh]
                b, t, _ = x.shape
                return x.reshape(b, t, h, dh).transpose(0, 2, 1, 3)

            qh, kh, vh = split(qp), split(kp), split(vp)
            scores = jnp.einsum(
                "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
            ) / math.sqrt(dh)
            if attn_bias is not None:
                scores = scores + attn_bias
            probs = jax.nn.softmax(scores, axis=-1)
            probs = nn.Dropout(self.dropout)(probs, deterministic=deterministic)
            out = jnp.einsum(
                "bhqk,bhkd->bhqd", probs, vh, preferred_element_type=jnp.float32
            )
            out = out.transpose(0, 2, 1, 3).reshape(q.shape)
        w_out = self.param(
            "out_proj_kernel",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -1.0 / math.sqrt(d), 1.0 / math.sqrt(d)
            ),
            (d, d),
        )
        # torch MultiheadAttention's out_proj has a TRAINABLE zero-init bias
        # (_reset_parameters: constant_(out_proj.bias, 0.)) — zero-init, not
        # absent: it trains away from zero (model_seq.py:348-351).
        b_out = self.param("out_proj_bias", nn.initializers.zeros, (d,))
        return out @ w_out + b_out


class PointWiseFeedForward(nn.Module):
    """SASRec FFN (model_seq.py:311-326): two k=1 convs (== dense), ReLU,
    dropouts, residual."""

    dropout: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        d = x.shape[-1]
        y = TorchLinear(d, name="conv1")(x)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.relu(y)
        y = TorchLinear(d, name="conv2")(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return y + x


class SasrecEncoder(nn.Module):
    """Log2feats (model_seq.py:331-387). Input is the already-embedded
    sequence; positions are 0..T-1 of the (possibly InnerComp-doubled) axis."""

    seq_len: int  # maximum encoder length (for the pos table)
    num_blocks: int = 2
    num_heads: int = 8
    dropout: float = 0.5
    kernels: str = "xla"
    # Rematerialize attention/FFN internals in the backward (jax.checkpoint
    # via nn.remat): trades recompute FLOPs for activation memory — needed
    # for the big-batch / 50M-row configs (docs/PERF.md scaling section).
    # Param tree is unchanged (lifted transform keeps module names).
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        b, t, d = x.shape
        mha, ffn = TorchMultiheadAttention, PointWiseFeedForward
        if self.remat:
            # static_argnums count self as 0 (flax lifted-transform rule);
            # `deterministic` drives python control flow so it must be static
            mha = nn.remat(TorchMultiheadAttention, static_argnums=(5,))
            ffn = nn.remat(PointWiseFeedForward, static_argnums=(2,))
        pos = self.param("pos_emb", torch_embedding_init, (self.seq_len, d))
        x = x + pos[None, :t, :]
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        # Causal additive mask (~tril -> -inf above diagonal, model_seq.py:369)
        causal = jnp.triu(jnp.full((t, t), NEG_INF, jnp.float32), k=1)[None, None]
        for i in range(self.num_blocks):
            q = TorchLayerNorm(eps=1e-8, name=f"attn_ln_{i}")(x)
            a = mha(
                self.num_heads, self.dropout, self.kernels, name=f"attn_{i}"
            )(q, x, x, causal, deterministic)
            # Residual adds onto the normalized Q (model_seq.py:378) — a
            # reference quirk kept for parity.
            x = q + a
            x = TorchLayerNorm(eps=1e-8, name=f"ffn_ln_{i}")(x)
            x = ffn(self.dropout, name=f"ffn_{i}")(x, deterministic)
        return TorchLayerNorm(eps=1e-8, name="last_ln")(x)


class BertBlock(nn.Module):
    """TransformerBlock (model_seq.py:221-245): pre-norm sublayers with the
    hand-rolled LayerNorm, per-head attention with key mask, tanh-GELU FFN,
    trailing dropout."""

    num_heads: int
    ff_dim: int
    dropout: float
    kernels: str = "xla"

    @nn.compact
    def __call__(
        self, x: jax.Array, key_mask: jax.Array, deterministic: bool
    ) -> jax.Array:
        d = x.shape[-1]
        h, dh = self.num_heads, d // self.num_heads

        # --- attention sublayer: x + drop(MHA(norm(x))) (model_seq.py:140-142)
        q_in = RefLayerNorm(name="ln1")(x)
        qp = TorchLinear(d, name="q")(q_in)
        kp = TorchLinear(d, name="k")(q_in)
        vp = TorchLinear(d, name="v")(q_in)

        if _use_pallas_attention(self.kernels, x.shape[1]):
            from amid_tpu.ops.pallas_attention import fused_attention

            seed, rate = _dropout_seed(self, deterministic, self.dropout)
            # masked_fill(mask == 0, -1e9) as an additive key bias
            # [B, 1, 1, Tk] (model_seq.py:155)
            bias = jnp.where(key_mask[:, None, None, :], 0.0, NEG_INF)
            att = fused_attention(qp, kp, vp, bias, seed, h, rate)
        else:

            def split(y):
                b, t, _ = y.shape
                return y.reshape(b, t, h, dh).transpose(0, 2, 1, 3)

            scores = jnp.einsum(
                "bhqd,bhkd->bhqk", split(qp), split(kp),
                preferred_element_type=jnp.float32,
            ) / math.sqrt(dh)
            # masked_fill(mask == 0, -1e9) (model_seq.py:155); key_mask [B, Tk]
            scores = jnp.where(key_mask[:, None, None, :], scores, NEG_INF)
            probs = jax.nn.softmax(scores, axis=-1)
            probs = nn.Dropout(self.dropout, name="attn_drop")(
                probs, deterministic=deterministic
            )
            att = jnp.einsum(
                "bhqk,bhkd->bhqd", probs, split(vp),
                preferred_element_type=jnp.float32,
            )
            att = att.transpose(0, 2, 1, 3).reshape(x.shape)
        att = TorchLinear(d, name="out")(att)
        x = x + nn.Dropout(self.dropout, name="subl1_drop")(
            att, deterministic=deterministic
        )

        # --- FFN sublayer
        f_in = RefLayerNorm(name="ln2")(x)
        f = TorchLinear(self.ff_dim, name="ff1")(f_in)
        f = nn.Dropout(self.dropout, name="ff_drop")(
            tanh_gelu(f), deterministic=deterministic
        )
        f = TorchLinear(d, name="ff2")(f)
        x = x + nn.Dropout(self.dropout, name="subl2_drop")(
            f, deterministic=deterministic
        )
        return nn.Dropout(self.dropout, name="block_drop")(
            x, deterministic=deterministic
        )


class Bert4RecEncoder(nn.Module):
    """One tower of the BERT4Rec stack (model_seq.py:264-267): blocks of
    BertBlock(d=128, h=4, ff=512, p=0.1), no positional embedding."""

    num_blocks: int = 2
    num_heads: int = 4
    ff_dim: int = 512
    dropout: float = 0.1
    kernels: str = "xla"

    @nn.compact
    def __call__(
        self, x: jax.Array, key_mask: jax.Array, deterministic: bool
    ) -> jax.Array:
        for i in range(self.num_blocks):
            x = BertBlock(
                self.num_heads, self.ff_dim, self.dropout, self.kernels,
                name=f"block_{i}",
            )(x, key_mask, deterministic)
        return x


class GruEncoder(nn.Module):
    """GRU4Rec tower (model_seq.py:72-73,92-95): single-layer GRU, zero
    initial hidden state. (The reference's dropout=0.5 on a 1-layer torch GRU
    is a documented no-op and is omitted.)"""

    hidden: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return TorchGRU(self.hidden, name="gru")(x)
