"""Explicit-SPMD (shard_map) path vs the dense single-device path: forward
logits, gradients, and a full train step on a 4x2 CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from amid_tpu.config import ModelConfig
from amid_tpu.models.amid import build_model
from amid_tpu.parallel.context import SpmdAxes, spmd
from amid_tpu.parallel.spmd import make_spmd_train_step, param_specs
from amid_tpu.train import losses
from amid_tpu.train.steps import TrainState, _make_labels


def _mesh():
    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    return Mesh(devs, ("data", "model"))


def _cfg(**kw):
    base = dict(
        backbone="sasrec", emb_dim=16, hid_dim=8, seq_len=4, batch_size=16,
        item_length=64, user_length=64, sasrec_heads=2, is_itc=True, ts2=0.3,
        kernels="xla", sasrec_dropout=0.0,
    )
    base.update(kw)
    return ModelConfig(**base)


def _batch(cfg, rng, num_neg=2):
    b, l = cfg.batch_size, cfg.seq_len
    v = cfg.item_table_size
    return {
        "target": jnp.asarray(rng.integers(0, v, b, dtype=np.int32)),
        "neg_samples": jnp.asarray(rng.integers(0, v, (b, num_neg), dtype=np.int32)),
        "seq_d1": jnp.asarray(rng.integers(0, v, (b, l), dtype=np.int32)),
        "seq_d2": jnp.asarray(rng.integers(0, v, (b, l), dtype=np.int32)),
    }


@pytest.fixture
def setup(rng):
    cfg = _cfg()
    model = build_model(cfg)
    batch = _batch(cfg, rng)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, batch, train=False)[
        "params"
    ]
    return cfg, model, batch, params


def test_spmd_forward_matches_dense(setup):
    """Sharded forward (batch over data, table over model, explicit
    all_gather in InterComp + mask-and-psum lookup) == dense forward."""
    cfg, model, batch, params = setup
    mesh = _mesh()
    axes = SpmdAxes(data_shards=4, model_shards=2)

    def fwd(params, batch):
        with spmd(axes):
            out = model.apply({"params": params}, batch, train=False)
        return out["logits_d1"], out["logits_d2"]

    sharded = jax.jit(
        jax.shard_map(
            fwd, mesh=mesh,
            in_specs=(param_specs(params), {k: P("data") for k in batch}),
            out_specs=(P("data"), P("data")),
            check_vma=True,
        )
    )
    got1, got2 = sharded(params, batch)
    want = model.apply({"params": params}, batch, train=False)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want["logits_d1"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want["logits_d2"]),
                               rtol=1e-4, atol=1e-5)


def test_spmd_grads_match_dense(setup):
    """Gradients through the sharded lookup + all_gather match the dense
    path (table grad = local scatter-add; replicated grads psum'd)."""
    cfg, model, batch, params = setup
    mesh = _mesh()
    axes = SpmdAxes(data_shards=4, model_shards=2)
    labels = _make_labels(cfg.batch_size, 2)
    dom = jnp.asarray((np.arange(cfg.batch_size) % 2).astype(np.int32))

    def dense_loss(params):
        out = model.apply({"params": params}, batch, train=False)
        return losses.masked_bce_loss(
            out["logits_d1"], out["logits_d2"], labels, dom
        )

    def local_loss(params, batch, labels, dom):
        with spmd(axes):
            out = model.apply({"params": params}, batch, train=False)
        return jax.lax.pmean(
            losses.masked_bce_loss(
                out["logits_d1"], out["logits_d2"], labels, dom
            ),
            "data",
        )

    def sharded_grad(params, batch, labels, dom):
        # shard_map AD psums replicated-input cotangents automatically
        return jax.grad(local_loss)(params, batch, labels, dom)

    g_sharded = jax.jit(
        jax.shard_map(
            sharded_grad, mesh=mesh,
            in_specs=(
                param_specs(params), {k: P("data") for k in batch},
                P("data"), P("data"),
            ),
            out_specs=param_specs(params),
            check_vma=True,
        )
    )(params, batch, labels, dom)
    g_dense = jax.grad(dense_loss)(params)

    flat_s = jax.tree_util.tree_leaves_with_path(g_sharded)
    flat_d = dict(
        (jax.tree_util.keystr(p), x)
        for p, x in jax.tree_util.tree_leaves_with_path(g_dense)
    )
    for path, xs in flat_s:
        xd = flat_d[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(
            np.asarray(xs), np.asarray(xd), rtol=2e-4, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_spmd_train_step_runs(setup, rng):
    cfg, model, batch, params = setup
    mesh = _mesh()
    tx = optax.adam(1e-3)
    state = TrainState(params, tx.init(params), None)
    full = dict(batch)
    full["domain_id"] = jnp.asarray(rng.integers(0, 2, cfg.batch_size, dtype=np.int32))
    full["reject"] = jnp.full((cfg.batch_size, 2), 10_000, jnp.int32)
    full["reject_counts"] = jnp.zeros(cfg.batch_size, jnp.int32)
    full["ob_label"] = jnp.ones(cfg.batch_size, jnp.int32)
    del full["neg_samples"]
    pools = jnp.tile(jnp.arange(cfg.item_table_size, dtype=jnp.int32)[None], (2, 1))
    pool_sizes = jnp.array([cfg.item_table_size] * 2, jnp.int32)

    step = make_spmd_train_step(model, tx, mesh, dr_e_w=None)
    state2, metrics = step(state, full, pools, pool_sizes, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # params actually moved
    delta = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, state2.params
    )
    assert max(jax.tree_util.tree_leaves(delta)) > 0
