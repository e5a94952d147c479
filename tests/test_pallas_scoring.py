"""Scoring-head kernel vs the XLA formulation (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from amid_tpu.ops.pallas_scoring import scoring_head_pallas


def _params(rng, d=128, h=32):
    ku = jnp.asarray(rng.normal(size=(d, h)).astype(np.float32) * 0.05)
    ki = jnp.asarray(rng.normal(size=(d, h)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.normal(size=(h,)).astype(np.float32) * 0.05)
    k2 = jnp.asarray(rng.normal(size=(h, 1)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=(1,)).astype(np.float32) * 0.1)
    return ku, ki, b1, k2, b2


def xla_head(user, items, ku, ki, b1, k2, b2):
    u_part = user @ ku
    i_part = jnp.einsum("bcd,dh->bch", items, ki)
    hidden = jax.nn.relu(u_part[:, None, :] + i_part + b1)
    return jax.nn.sigmoid(jnp.einsum("bch,ho->bco", hidden, k2)[..., 0] + b2[0])


def test_scoring_forward_matches_xla(rng):
    d = 128
    user = jnp.asarray(rng.normal(size=(4, d)).astype(np.float32))
    items = jnp.asarray(rng.normal(size=(4, 200, d)).astype(np.float32))
    params = _params(rng, d)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(scoring_head_pallas(user, items, *params))
    want = np.asarray(xla_head(user, items, *params))
    assert got.shape == (4, 200)  # C=200 padded to 256 internally, sliced back
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_scoring_grads_match_xla(rng):
    d = 128
    user = jnp.asarray(rng.normal(size=(4, d)).astype(np.float32))
    items = jnp.asarray(rng.normal(size=(4, 130, d)).astype(np.float32))
    params = _params(rng, d)

    def lp(user, items, *params):
        return jnp.sum(scoring_head_pallas(user, items, *params) ** 2)

    def lx(user, items, *params):
        return jnp.sum(xla_head(user, items, *params) ** 2)

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(lp, argnums=tuple(range(7)))(user, items, *params)
    gx = jax.grad(lx, argnums=tuple(range(7)))(user, items, *params)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
