"""Numeric oracles: the torch-compat ops must match PyTorch (CPU) bit-for-bit
within float tolerance. torch here is only an *oracle* for the math the
reference relies on (SURVEY.md §4 "numeric oracles")."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from amid_tpu.ops.torch_compat import (  # noqa: E402
    RefLayerNorm,
    TorchGRU,
    TorchLayerNorm,
    tanh_gelu,
)


def test_ref_layernorm_matches_handrolled_formula(rng):
    # reference model_seq.py:115-127: (x - mean)/(std_unbiased + eps)
    x = rng.normal(size=(4, 6, 16)).astype(np.float32)
    mod = RefLayerNorm(eps=1e-6)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(mod.apply(params, jnp.asarray(x)))

    t = torch.tensor(x)
    mean = t.mean(-1, keepdim=True)
    std = t.std(-1, keepdim=True)  # unbiased by default
    want = ((t - mean) / (std + 1e-6)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_torch_layernorm_matches_nn_layernorm(rng):
    x = rng.normal(size=(4, 6, 16)).astype(np.float32)
    mod = TorchLayerNorm(eps=1e-8)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    want = torch.nn.LayerNorm(16, eps=1e-8)(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_tanh_gelu_matches_reference_formula(rng):
    import math

    x = rng.normal(size=(128,)).astype(np.float32)
    got = np.asarray(tanh_gelu(jnp.asarray(x)))
    t = torch.tensor(x)
    want = (
        0.5 * t * (1 + torch.tanh(math.sqrt(2 / math.pi) * (t + 0.044715 * t**3)))
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_gru_matches_torch_gru(rng):
    """TorchGRU (lax.scan) vs torch nn.GRU with copied weights."""
    d, h, b, t = 8, 8, 3, 5
    x = rng.normal(size=(b, t, d)).astype(np.float32)

    mod = TorchGRU(hidden=h)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

    tg = torch.nn.GRU(d, h, 1, batch_first=True)
    with torch.no_grad():
        tg.weight_ih_l0.copy_(torch.tensor(np.asarray(params["w_ih"]).T))
        tg.weight_hh_l0.copy_(torch.tensor(np.asarray(params["w_hh"]).T))
        tg.bias_ih_l0.copy_(torch.tensor(np.asarray(params["b_ih"])))
        tg.bias_hh_l0.copy_(torch.tensor(np.asarray(params["b_hh"])))
        want, _ = tg(torch.tensor(x), torch.zeros(1, b, h))

    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-5)


def test_bce_matches_torch_bceloss(rng):
    from amid_tpu.train.losses import bce

    p = rng.uniform(0.01, 0.99, size=(4, 7)).astype(np.float32)
    y = (rng.uniform(size=(4, 7)) > 0.5).astype(np.float32)
    got = np.asarray(bce(jnp.asarray(p), jnp.asarray(y)))
    want = torch.nn.BCELoss(reduction="none")(
        torch.tensor(p), torch.tensor(y)
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
