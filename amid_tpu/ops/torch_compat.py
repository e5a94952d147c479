"""Numerics helpers that reproduce the reference's (PyTorch) math.

The rebuild is architecturally TPU-native, but metric parity requires the
same *math*: initialization distributions, the reference's two distinct
LayerNorm flavors, tanh-GELU, and the GRU gate convention.

* torch nn.Linear init: weight kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)),
  bias U(+-1/sqrt(fan_in)).
* torch nn.Embedding init: N(0, 1).
* Hand-rolled LayerNorm (model_seq.py:115-127): unbiased std (Bessel), eps
  added to std (not var).
* torch nn.LayerNorm (model_seq.py:342): biased var, eps inside rsqrt.
* tanh-approx GELU (model_seq.py:198-204).
* torch nn.GRU gate order/bias convention (model_seq.py:72-73).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """U(+-1/sqrt(fan_in)) for a [in, out] kernel (torch stores [out, in] but
    the bound depends only on fan_in)."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_embedding_init(key, shape, dtype=jnp.float32):
    """torch nn.Embedding default: N(0, 1)."""
    return jax.random.normal(key, shape, dtype)


def xavier_uniform_init(key, shape, dtype=jnp.float32):
    """For torch nn.MultiheadAttention in_proj (xavier_uniform_)."""
    fan_in, fan_out = shape[0], shape[1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchLinear(nn.Module):
    """Dense layer with torch nn.Linear's default initialization."""

    features: int
    use_bias: bool = True
    dtype: Dtype | None = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", torch_linear_kernel_init, (fan_in, self.features)
        )
        y = jnp.einsum(
            "...i,io->...o",
            x.astype(self.dtype) if self.dtype else x,
            kernel.astype(self.dtype) if self.dtype else kernel,
        )
        if self.use_bias:
            bias = self.param("bias", torch_linear_bias_init(fan_in), (self.features,))
            y = y + bias
        return y


class RefLayerNorm(nn.Module):
    """The reference's hand-rolled LayerNorm (model_seq.py:115-127):
    (x - mean) / (std + eps) with *unbiased* std, then affine."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        a = self.param("scale", nn.initializers.ones, (d,))
        b = self.param("bias", nn.initializers.zeros, (d,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        # unbiased (Bessel-corrected) std, like torch Tensor.std default
        var = jnp.sum((x - mean) ** 2, axis=-1, keepdims=True) / (d - 1)
        return a * (x - mean) / (jnp.sqrt(var) + self.eps) + b


class TorchLayerNorm(nn.Module):
    """torch nn.LayerNorm: biased variance, eps inside rsqrt (model_seq.py:342)."""

    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        a = self.param("scale", nn.initializers.ones, (d,))
        b = self.param("bias", nn.initializers.zeros, (d,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
        return a * (x - mean) * jax.lax.rsqrt(var + self.eps) + b


def tanh_gelu(x):
    """tanh-approx GELU (model_seq.py:198-204)."""
    return 0.5 * x * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x**3)))


class TorchGRU(nn.Module):
    """Single-layer GRU with torch's gate convention and init, run as a
    lax.scan over time (replaces cuDNN GRU, model_seq.py:72-73,92-95).

    torch convention: r = sig(W_ir x + b_ir + W_hr h + b_hr)
                      z = sig(W_iz x + b_iz + W_hz h + b_hz)
                      n = tanh(W_in x + b_in + r * (W_hn h + b_hn))
                      h' = (1 - z) * n + z * h
    All weights/biases U(+-1/sqrt(hidden)).
    """

    hidden: int

    @nn.compact
    def __call__(self, x):  # x: [B, T, D]
        h_dim = self.hidden
        bound = 1.0 / math.sqrt(h_dim)

        def uinit(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        w_ih = self.param("w_ih", uinit, (x.shape[-1], 3 * h_dim))  # [D, 3H]
        w_hh = self.param("w_hh", uinit, (h_dim, 3 * h_dim))
        b_ih = self.param("b_ih", uinit, (3 * h_dim,))
        b_hh = self.param("b_hh", uinit, (3 * h_dim,))

        x_proj = jnp.einsum("btd,dh->bth", x, w_ih) + b_ih  # [B, T, 3H]

        def step(h, xp):  # xp: [B, 3H]
            hp = h @ w_hh + b_hh
            xr, xz, xn = jnp.split(xp, 3, axis=-1)
            hr, hz, hn = jnp.split(hp, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1.0 - z) * n + z * h
            return h_new, h_new

        h0 = jnp.zeros((x.shape[0], h_dim), x.dtype)
        _, hs = jax.lax.scan(step, h0, jnp.swapaxes(x_proj, 0, 1))
        return jnp.swapaxes(hs, 0, 1)  # [B, T, H]
