"""Unique-row scatter-set kernel vs .at[].set(mode='drop') (interpret mode)."""

import numpy as np
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from amid_tpu.ops.pallas_scatter import scatter_set_unique_pallas


def _oracle(table, ids, rows):
    out = np.asarray(table).copy()
    for i, idx in enumerate(np.asarray(ids)):
        if 0 <= idx < out.shape[0]:
            out[idx] = np.asarray(rows)[i]
    return out


def test_scatter_set_matches_at_set(rng):
    v, d, n = 64, 128, 40  # n not a multiple of the row tile
    table = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    ids = jnp.asarray(rng.permutation(v)[:n].astype(np.int32))
    rows = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(scatter_set_unique_pallas(table, ids, rows))
    np.testing.assert_array_equal(got, _oracle(table, ids, rows))


def test_scatter_set_drops_sentinels(rng):
    v, d = 32, 128
    table = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    # sorted-unique-with-sentinel-tail shape, as produced by jnp.unique(size=)
    ids = jnp.asarray(np.array([1, 5, 9, v, v, v], dtype=np.int32))
    rows = jnp.asarray(rng.normal(size=(6, d)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(scatter_set_unique_pallas(table, ids, rows))
    np.testing.assert_array_equal(got, _oracle(table, ids, rows))


def test_scatter_set_wide_2d_fallback(rng):
    """2D rows wider than 128 fall back to XLA (fast path needs 3D storage)."""
    v, d, n = 48, 384, 20
    table = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    ids = jnp.asarray(rng.permutation(v)[:n].astype(np.int32))
    rows = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    got = np.asarray(scatter_set_unique_pallas(table, ids, rows))
    np.testing.assert_array_equal(got, _oracle(table, ids, rows))


def test_scatter_set_3d_rows(rng):
    """[V, K, D] fused-row tables: one DMA per [K, D] row slice."""
    v, k, d, n = 48, 3, 128, 20
    table = jnp.asarray(rng.normal(size=(v, k, d)).astype(np.float32))
    ids = jnp.asarray(
        np.concatenate([rng.permutation(v)[:n], [v, v + 7]]).astype(np.int32)
    )
    rows = jnp.asarray(rng.normal(size=(n + 2, k, d)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(scatter_set_unique_pallas(table, ids, rows))
    want = np.asarray(table).copy()
    for i, idx in enumerate(np.asarray(ids)):
        if 0 <= idx < v:
            want[idx] = np.asarray(rows)[i]
    np.testing.assert_array_equal(got, want)


def test_scatter3_fused_matches_three_calls(rng):
    """Fused 3-array scatter (one kernel, 3xN DMAs in one issue window) vs
    three independent scatter_set calls — identical results incl. sentinel
    drops and a non-tile-multiple row count."""
    from amid_tpu.ops.pallas_scatter import scatter_set_unique3_pallas

    v, d, n = 64, 128, 37
    t = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    m = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    nn_ = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    ids = np.sort(rng.permutation(v)[: n - 2].astype(np.int32))
    ids = jnp.asarray(np.concatenate([ids, [v, v]]))  # sentinel tail
    tr = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    mr = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    nr = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        gt, gm, gn = scatter_set_unique3_pallas(t, m, nn_, ids, tr, mr, nr)
    np.testing.assert_array_equal(np.asarray(gt), _oracle(t, ids, tr))
    np.testing.assert_array_equal(np.asarray(gm), _oracle(m, ids, mr))
    np.testing.assert_array_equal(np.asarray(gn), _oracle(nn_, ids, nr))
