"""Fused attention kernel vs plain XLA attention (interpret mode)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from amid_tpu.ops.pallas_attention import fused_attention


def xla_attention(q, k, v, bias, heads):
    b, t, d = q.shape
    dh = d // heads

    def split(x):
        return x.reshape(b, t, heads, dh).transpose(0, 2, 1, 3)

    s = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k)) / math.sqrt(dh)
    s = s + bias
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, split(v))
    return o.transpose(0, 2, 1, 3).reshape(b, t, d)


def _data(rng, b=8, t=16, d=32):
    q = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    causal = jnp.triu(jnp.full((t, t), -1e9, jnp.float32), k=1)[None, None]
    return q, k, v, causal


def test_fused_attention_forward_matches_xla(rng):
    q, k, v, bias = _data(rng)
    seed = jnp.zeros((1,), jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_attention(q, k, v, bias, seed, 4, 0.0))
    want = np.asarray(xla_attention(q, k, v, bias, 4))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_attention_grads_match_xla(rng):
    q, k, v, bias = _data(rng)
    seed = jnp.zeros((1,), jnp.int32)

    def loss_pallas(q, k, v):
        return jnp.sum(fused_attention(q, k, v, bias, seed, 4, 0.0) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v, bias, 4) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fused_attention_batched_bias(rng):
    """Per-row key-padding bias (BERT4Rec path) with a ragged batch."""
    q, k, v, _ = _data(rng, b=11)
    key_ok = jnp.asarray(rng.integers(0, 2, (11, 16)).astype(bool))
    key_ok = key_ok.at[:, 0].set(True)  # keep at least one key per row
    bias = jnp.broadcast_to(
        jnp.where(key_ok[:, None, None, :], 0.0, -1e9), (11, 1, 16, 16)
    )
    seed = jnp.zeros((1,), jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_attention(q, k, v, bias, seed, 4, 0.0))
    want = np.asarray(xla_attention(q, k, v, bias, 4))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_attention_dropout_statistics(rng):
    """Dropout reproducibility/statistics. Interpret mode's prng_random_bits
    returns all-zero bits, so the statistical assertions only hold on a real
    TPU backend (exercised by tools/bench_kernels.py --kernel attention);
    here we only check determinism under a fixed seed."""
    import pytest

    q, k, v, bias = _data(rng)
    seed = jnp.asarray([42], jnp.int32)

    def f(s):
        with pltpu.force_tpu_interpret_mode():
            return fused_attention(q, k, v, bias, s, 4, 0.5)

    a, b = np.asarray(f(seed)), np.asarray(f(seed))
    np.testing.assert_array_equal(a, b)  # same seed -> same mask
    if jax.default_backend() != "tpu":
        pytest.skip("prng_random_bits is zero-filled in interpret mode")
    c = np.asarray(f(jnp.asarray([43], jnp.int32)))
    assert not np.allclose(a, c)


def test_fused_attention_bf16_operands(rng):
    """mxu_bf16=True casts matmul OPERANDS to bf16 with fp32 accumulation
    (the XLA-path DEFAULT precision class on TPU); must match an oracle
    that casts at the same points, and stay within bf16 rounding of the
    exact-fp32 kernel."""
    import math

    q, k, v, bias = _data(rng)
    seed = jnp.zeros((1,), jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_attention(q, k, v, bias, seed, 4, 0.0, True))
        exact = np.asarray(fused_attention(q, k, v, bias, seed, 4, 0.0))

    def bf16_oracle(q, k, v, bias, heads):
        b, t, d = q.shape
        dh = d // heads

        def split(x):
            return x.reshape(b, t, heads, dh).transpose(0, 2, 1, 3)

        def bdot(x, y, spec):
            return jnp.einsum(
                spec, x.astype(jnp.bfloat16), y.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )

        s = bdot(split(q), split(k), "bhqd,bhkd->bhqk") / math.sqrt(dh)
        p = jax.nn.softmax(s + bias, axis=-1)
        o = bdot(p, split(v), "bhqk,bhkd->bhqd")
        return o.transpose(0, 2, 1, 3).reshape(b, t, d)

    want = np.asarray(bf16_oracle(q, k, v, bias, 4))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # and the mode stays within bf16 rounding of exact fp32
    np.testing.assert_allclose(got, exact, rtol=0.05, atol=0.05)


def test_fused_attention_bf16_grads_finite(rng):
    q, k, v, bias = _data(rng)
    seed = jnp.zeros((1,), jnp.int32)

    def loss(q, k, v):
        return jnp.sum(fused_attention(q, k, v, bias, seed, 4, 0.0, True) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a in g:
        assert np.isfinite(np.asarray(a)).all()
