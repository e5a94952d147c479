"""Model forward: shapes, output ranges, and backbone/flag combinations
(model_seq.py:56,248,390 constructor matrix)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from amid_tpu.config import ModelConfig
from amid_tpu.models.amid import build_model


def tiny_cfg(**kw) -> ModelConfig:
    base = dict(
        backbone="sasrec",
        emb_dim=16,
        hid_dim=8,
        seq_len=6,
        batch_size=4,
        item_length=50,
        user_length=50,
        sasrec_heads=2,
        bert_heads=2,
        bert_ff_dim=32,
        kernels="xla",
    )
    base.update(kw)
    return ModelConfig(**base)


def make_batch(cfg: ModelConfig, num_neg: int, rng):
    b, l = cfg.batch_size, cfg.seq_len
    return {
        "target": jnp.asarray(rng.integers(0, 50, b, dtype=np.int32)),
        "neg_samples": jnp.asarray(rng.integers(0, 50, (b, num_neg), dtype=np.int32)),
        "seq_d1": jnp.asarray(rng.integers(0, 52, (b, l), dtype=np.int32)),
        "seq_d2": jnp.asarray(rng.integers(0, 52, (b, l), dtype=np.int32)),
    }


@pytest.mark.parametrize("backbone", ["gru4rec", "sasrec", "bert4rec"])
@pytest.mark.parametrize("inc,itc", [(False, False), (True, False), (False, True)])
def test_forward_shapes(backbone, inc, itc, rng):
    cfg = tiny_cfg(backbone=backbone, is_inc=inc, is_itc=itc)
    model = build_model(cfg)
    batch = make_batch(cfg, num_neg=3, rng=rng)
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key, "dropout": key}, batch, train=False)
    out = model.apply(params, batch, train=False)
    assert out["logits_d1"].shape == (cfg.batch_size, 4)
    assert out["logits_d2"].shape == (cfg.batch_size, 4)
    # sigmoid outputs (model_seq.py:48)
    for k in ("logits_d1", "logits_d2"):
        v = np.asarray(out[k])
        assert (v >= 0).all() and (v <= 1).all()


def test_dr_heads_present(rng):
    cfg = tiny_cfg(is_dr=True)
    model = build_model(cfg)
    batch = make_batch(cfg, num_neg=2, rng=rng)
    key = jax.random.PRNGKey(1)
    params = model.init({"params": key, "dropout": key}, batch, train=False)
    out = model.apply(params, batch, train=False)
    assert set(out) == {
        "logits_d1", "logits_d2", "ips_d1", "ips_d2", "gfunc_d1", "gfunc_d2",
        "u_d1", "u_d2",
    }


def test_train_mode_uses_dropout(rng):
    cfg = tiny_cfg(backbone="sasrec")
    model = build_model(cfg)
    batch = make_batch(cfg, num_neg=1, rng=rng)
    key = jax.random.PRNGKey(2)
    params = model.init({"params": key, "dropout": key}, batch, train=False)
    a = model.apply(params, batch, train=True, rngs={"dropout": jax.random.PRNGKey(3)})
    b = model.apply(params, batch, train=True, rngs={"dropout": jax.random.PRNGKey(4)})
    assert not np.allclose(np.asarray(a["logits_d1"]), np.asarray(b["logits_d1"]))
    # eval is deterministic
    c = model.apply(params, batch, train=False)
    d = model.apply(params, batch, train=False)
    np.testing.assert_array_equal(np.asarray(c["logits_d1"]), np.asarray(d["logits_d1"]))


def test_head_split_kernel_equals_concat(rng):
    """PredictHead's split-kernel form == sigmoid(MLP(cat(u, i)))
    (model_seq.py:40-54)."""
    from amid_tpu.models.heads import PredictHead

    d, h, b, c = 8, 4, 3, 5
    u1 = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    u2 = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    items = jnp.asarray(rng.normal(size=(b, c, d)).astype(np.float32))
    head = PredictHead(hid_dim=h)
    params = head.init(jax.random.PRNGKey(0), u1, u2, items)
    l1, l2 = head.apply(params, u1, u2, items)

    p = params["params"]
    k1, b1 = np.asarray(p["fc1_kernel"]), np.asarray(p["fc1_bias"])
    k2, b2 = np.asarray(p["fc2_kernel"]), np.asarray(p["fc2_bias"])

    def ref(u):
        uu = np.broadcast_to(np.asarray(u)[:, None, :], items.shape)
        cat = np.concatenate([uu, np.asarray(items)], -1)
        hdn = np.maximum(cat @ k1 + b1, 0)
        return 1.0 / (1.0 + np.exp(-(hdn @ k2 + b2)))[..., 0]

    np.testing.assert_allclose(np.asarray(l1), ref(u1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(l2), ref(u2), rtol=1e-5, atol=1e-6)


def test_remat_is_semantics_preserving(rng):
    """cfg.remat rematerializes attention/FFN internals (nn.remat) — the
    param tree, forward (incl. the dropout PRNG replay in train mode), and
    gradients must be identical to the non-remat model; only backward
    memory changes (tools/exp_50m_phases.py, docs/PERF.md scaling)."""
    cfg = tiny_cfg(is_itc=True, is_dr=True)
    cfg_r = tiny_cfg(is_itc=True, is_dr=True, remat=True)
    m, mr = build_model(cfg), build_model(cfg_r)
    batch = make_batch(cfg, 2, rng)
    key = jax.random.PRNGKey(0)
    p = m.init({"params": key, "dropout": key}, batch, train=False)["params"]
    pr = mr.init({"params": key, "dropout": key}, batch, train=False)["params"]
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(pr)

    def loss(model, params):
        out = model.apply({"params": params}, batch, train=True,
                          rngs={"dropout": jax.random.PRNGKey(7)})
        return (out["logits_d1"].sum() + out["logits_d2"].sum()
                + out["ips_d1"].sum() + out["gfunc_d1"].sum())

    l0, g0 = jax.value_and_grad(lambda q: loss(m, q))(p)
    l1, g1 = jax.value_and_grad(lambda q: loss(mr, q))(p)
    assert float(l0) == pytest.approx(float(l1), rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)
