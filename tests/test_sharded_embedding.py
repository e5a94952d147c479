"""Row-sharded embedding lookup on an 8-device CPU mesh: forward gather
parity and backward scatter-add parity vs the dense path (SURVEY.md §2.5 /
§7 "hard parts")."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from amid_tpu.parallel.embedding import sharded_lookup


def _mesh():
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, ("data", "model"))


def test_sharded_lookup_matches_dense(rng):
    mesh = _mesh()
    v, d = 64, 16  # 4 model shards x 16 rows
    table = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, v, (8, 5), dtype=np.int32))

    def f(table, ids):
        return sharded_lookup(table, ids, "model", 4)

    out = jax.jit(
        jax.shard_map(
            f, mesh=mesh,
            in_specs=(P("model", None), P("data", None)),
            out_specs=P("data", None, None),
        )
    )(table, ids)
    want = np.asarray(table)[np.asarray(ids)]
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6, atol=1e-6)


def test_sharded_lookup_backward_scatter_add(rng):
    """grad wrt the sharded table == dense scatter-add of cotangents,
    including repeated ids (the scatter must accumulate)."""
    mesh = _mesh()
    v, d = 32, 8
    table = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    ids = jnp.asarray(
        np.array([[1, 1, 5, 31], [0, 7, 7, 7]], dtype=np.int32)
    )
    w = jnp.asarray(rng.normal(size=(2, 4, d)).astype(np.float32))

    def loss(table):
        def f(tbl, ids, w):
            rows = sharded_lookup(tbl, ids, "model", 4)
            return jnp.sum(rows * w, keepdims=True)[None]

        parts = jax.shard_map(
            f, mesh=mesh,
            in_specs=(P("model", None), P("data", None), P("data", None, None)),
            out_specs=P("data", None),
        )(table, ids, w)
        return jnp.sum(parts)

    g = jax.jit(jax.grad(loss))(table)
    want = np.zeros((v, d), np.float32)
    for r in range(2):
        for c in range(4):
            want[int(ids[r, c])] += np.asarray(w)[r, c]
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-5, atol=1e-5)
