"""Pallas TPU fused multi-head attention (forward + backward).

Fuses scores -> mask -> softmax -> prob-dropout -> PV into one VMEM-resident
kernel. The XLA path materializes the attention probabilities
[B, h, T, T] in HBM (for the amazon config that's 256*8*160*160*4 = 210 MB
per encoder block per direction); here no score/prob block ever leaves VMEM.

Head handling without reshapes (Mosaic cannot lane-split [*, T, D] ->
[*, T, h, dh], and its matmul takes <=1 batch dim): each head is computed as
a full-width contraction with a lane mask,

    S_h = (Q . m_h) K^T        (m_h zeroes lanes outside head h, so the
                                128-wide contraction equals the dh-wide one;
                                the MXU pass count is identical because the
                                contraction occupies one 128-tile either way)
    O  += P_h (V . m_h)        (the product lands exactly in head h's lanes)

Semantics match the reference exactly:
* additive mask (causal for SASRec — model_seq.py:369; key-padding converted
  to additive for BERT4Rec — model_seq.py:155),
* softmax over keys, dropout on the probabilities (model_seq.py:157-160;
  torch nn.MultiheadAttention semantics) with inverse scaling 1/keep,
* per-head scale 1/sqrt(dh).

Dropout reproducibility across fwd/bwd: the kernel seeds the per-core PRNG
with (seed, program_id, head) and regenerates the identical mask in the
backward kernel — the [B, h, T, T] mask is never stored.

Backward (per head, P = softmax(S), Pd = dropout(P)):
    dV_h = Pd^T (dO . m_h)
    dPd  = (dO . m_h) V^T ;  dP = dPd * keep / (1-rate)
    dS   = P * (dP - rowsum(dP * P))
    dQ  += (dS K) . m_h / sqrt(dh) ;  dK += (dS^T Q) . m_h / sqrt(dh)
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _tile_b(t: int) -> int:
    """Batch rows per grid cell, sized so the kernel's VMEM footprint
    (7 io blocks [TB, T, D] double-buffered + ~6 score temporaries
    [TB, T, T]) stays under the 16 MB scoped limit."""
    if t <= 96:
        return 8
    if t <= 192:
        return 4
    return 2


def _lane_mask(d, h_idx, dh):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, d), 2)
    return ((lane // dh) == h_idx).astype(jnp.float32)


def _bdot(x, y, contract, dtype=None):
    """Batched dot over leading batch dim: x [B, ., .], y [B, ., .].

    dtype=bfloat16 casts the OPERANDS only (accumulation stays fp32 via
    preferred_element_type). MEASURED on chip to be a no-op on the current
    toolchain (results/attn_bf16.json): outputs bit-identical to the
    f32-operand form and timing within noise (casts slightly slower) —
    i.e. Mosaic already lowers these f32 matmuls to single-pass
    bf16-class MXU passes (the fwd rate, ~81 TF/s executed at T=160,
    rules out 3-/6-pass fp32 decompositions). The knob exists so a future
    toolchain that runs f32 operands multi-pass can be re-measured and
    flipped without kernel surgery."""
    if dtype is not None:
        x, y = x.astype(dtype), y.astype(dtype)
    return jax.lax.dot_general(
        x, y,
        dimension_numbers=((contract[0], contract[1]), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _dropout_mask(shape, rate):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # uniform in [0, 1) from the top 24 bits; route the cast through int32
    # (Mosaic has no uint32->f32 cast; the shifted value is < 2^24 so the
    # int32 reinterpretation is exact)
    bits24 = pltpu.bitcast(bits >> 8, jnp.int32)
    u = bits24.astype(jnp.float32) * (1.0 / (1 << 24))
    return (u >= rate).astype(jnp.float32)


def _bias_block(bias_ref):
    # bias block [TB|1, 1, 1|T, T] -> [TB|1, 1|T, T]
    return bias_ref[:, 0]


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *, heads,
                rate, mxu):
    tb, t, d = q_ref.shape
    dh = d // heads
    scale = 1.0 / math.sqrt(dh)
    q, k, v = q_ref[:], k_ref[:], v_ref[:]
    bias = _bias_block(bias_ref)
    o = jnp.zeros((tb, t, d), jnp.float32)
    for h_idx in range(heads):
        m = _lane_mask(d, h_idx, dh)
        s = _bdot(q * m, k, ((2,), (2,)), mxu) * scale + bias  # [TB, T, T]
        p = jax.nn.softmax(s, axis=-1)
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0], pl.program_id(0) * heads + h_idx)
            p = p * _dropout_mask(p.shape, rate) * (1.0 / (1.0 - rate))
        o = o + _bdot(p, v * m, ((2,), (1,)), mxu)  # lands in head lanes
    o_ref[:] = o


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, heads, rate, mxu):
    tb, t, d = q_ref.shape
    dh = d // heads
    scale = 1.0 / math.sqrt(dh)
    q, k, v, do = q_ref[:], k_ref[:], v_ref[:], do_ref[:]
    bias = _bias_block(bias_ref)
    dq = jnp.zeros((tb, t, d), jnp.float32)
    dk = jnp.zeros((tb, t, d), jnp.float32)
    dv = jnp.zeros((tb, t, d), jnp.float32)
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    for h_idx in range(heads):
        m = _lane_mask(d, h_idx, dh)
        s = _bdot(q * m, k, ((2,), (2,)), mxu) * scale + bias
        p = jax.nn.softmax(s, axis=-1)
        do_h = do * m
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0], pl.program_id(0) * heads + h_idx)
            keep = _dropout_mask(p.shape, rate)
            pd = p * keep * inv_keep
        else:
            keep = None
            pd = p
        dv = dv + _bdot(pd, do_h, ((1,), (1,)), mxu)  # Pd^T dO_h
        # dO_h V^T (masked lanes -> head h)
        dp = _bdot(do_h, v, ((2,), (2,)), mxu)
        if keep is not None:
            dp = dp * keep * inv_keep
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = dq + _bdot(ds, k, ((2,), (1,)), mxu) * m * scale
        dk = dk + _bdot(ds, q, ((1,), (1,)), mxu) * m * scale
    dq_ref[:] = dq
    dk_ref[:] = dk
    dv_ref[:] = dv


def _specs(bsz, t, d, bias_shape, tb):
    io = pl.BlockSpec((tb, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    bq = bias_shape[2]  # 1 (key-mask broadcast over queries) or t
    if bias_shape[0] != 1:
        bias = pl.BlockSpec((tb, 1, bq, t), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    else:
        bias = pl.BlockSpec((1, 1, bq, t), lambda i: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    return io, bias


def _pad_b(x, tb):
    rem = (-x.shape[0]) % tb
    if rem:
        x = jnp.concatenate(
            [x, jnp.broadcast_to(x[:1], (rem,) + x.shape[1:])], axis=0
        )
    return x


_BIAS_SHAPES = "[1|B, 1, 1|T, T]"


def _check_bias(bias, bsz, t):
    ok = (
        bias.shape[0] in (1, bsz)
        and bias.shape[1] == 1
        and bias.shape[2] in (1, t)
        and bias.shape[3] == t
    )
    if not ok:
        raise ValueError(
            f"bias must be {_BIAS_SHAPES}; got {bias.shape} for T={t}, B={bsz}"
        )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_attention(q, k, v, bias, seed, heads, rate, mxu_bf16=False):
    """q, k, v: [B, T, D]; bias: additive [1|B, 1, 1|T, T]; seed: [1] int32
    array (traced — varies per step without recompiling); heads/rate/
    mxu_bf16 static. Returns [B, T, D]. bias and seed receive zero
    cotangents.

    mxu_bf16=True casts every matmul's operands to bfloat16 (fp32
    accumulation — see _bdot's measured-no-op note: on the current
    toolchain both modes produce bit-identical outputs at the same speed,
    so no dispatch site passes it; it is a guard for future toolchains).
    The default False is exact vs the interpret-mode fp32 oracles
    (test_pallas_attention); the bf16 mode has its own interpret-mode
    oracle (test_fused_attention_bf16_operands), which pins the CAST
    semantics — on chip, current Mosaic runs both modes identically."""
    return _fused_fwd_impl(q, k, v, bias, seed, heads, rate, mxu_bf16)


def _mxu(mxu_bf16):
    return jnp.bfloat16 if mxu_bf16 else None


def _fused_fwd_impl(q, k, v, bias, seed, heads, rate, mxu_bf16=False):
    bsz, t, d = q.shape
    _check_bias(bias, bsz, t)
    tb = _tile_b(t)
    qp, kp, vp = _pad_b(q, tb), _pad_b(k, tb), _pad_b(v, tb)
    bias_batched = bias.shape[0] != 1
    bias_p = _pad_b(bias, tb) if bias_batched else bias
    io, bspec = _specs(qp.shape[0], t, d, bias.shape, tb)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, rate=rate,
                          mxu=_mxu(mxu_bf16)),
        grid=(qp.shape[0] // tb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed [1]
            io, io, io, bspec,
        ],
        out_specs=io,
        out_shape=jax.ShapeDtypeStruct(qp.shape, jnp.float32),
    )(seed.astype(jnp.int32), qp, kp, vp, bias_p)
    return out[:bsz]


def _vjp_fwd(q, k, v, bias, seed, heads, rate, mxu_bf16):
    out = _fused_fwd_impl(q, k, v, bias, seed, heads, rate, mxu_bf16)
    return out, (q, k, v, bias, seed)


def _vjp_bwd(heads, rate, mxu_bf16, res, g):
    q, k, v, bias, seed = res
    bsz, t, d = q.shape
    tb = _tile_b(t)
    qp, kp, vp, gp = _pad_b(q, tb), _pad_b(k, tb), _pad_b(v, tb), _pad_b(g, tb)
    bias_batched = bias.shape[0] != 1
    bias_p = _pad_b(bias, tb) if bias_batched else bias
    io, bspec = _specs(qp.shape[0], t, d, bias.shape, tb)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, rate=rate,
                          mxu=_mxu(mxu_bf16)),
        grid=(qp.shape[0] // tb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            io, io, io, bspec, io,
        ],
        out_specs=(io, io, io),
        out_shape=tuple(
            jax.ShapeDtypeStruct(qp.shape, jnp.float32) for _ in range(3)
        ),
    )(seed.astype(jnp.int32), qp, kp, vp, bias_p, gp)
    return (
        dq[:bsz], dk[:bsz], dv[:bsz],
        jnp.zeros_like(bias),
        # integer primal -> float0 cotangent
        np.zeros(seed.shape, jax.dtypes.float0),
    )


fused_attention.defvjp(_vjp_fwd, _vjp_bwd)
