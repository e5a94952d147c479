"""Embedding-gather kernel vs jnp.take (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from amid_tpu.ops.pallas_embedding import embedding_gather_pallas


def test_gather_matches_take(rng):
    table = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 64, (5, 7), dtype=np.int32))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(embedding_gather_pallas(table, ids))
    want = np.asarray(table)[np.asarray(ids)]
    np.testing.assert_array_equal(got, want)


def test_gather_grad_is_scatter_add(rng):
    table = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    ids = jnp.asarray(np.array([0, 3, 3, 15], dtype=np.int32))
    w = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))

    def loss(t):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(embedding_gather_pallas(t, ids) * w)

    g = jax.grad(loss)(table)
    want = np.zeros((16, 8), np.float32)
    for i, idx in enumerate(np.asarray(ids)):
        want[idx] += np.asarray(w)[i]
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-6, atol=1e-6)
