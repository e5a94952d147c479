"""FULL-MODEL forward equivalence vs the ACTUAL reference SASRec
(model_seq.py:390-443): copy the flax parameters into the torch modules and
compare end-to-end probabilities on the same batch. This is the
integration-level companion to the per-module oracles (test_comp,
test_torch_compat) — it pins the whole composition: embedding lookup ->
pos emb -> pre-LN Q / un-normalized K,V attention (Q-residual quirk) ->
PointWiseFeedForward -> last LN -> mean pool -> predictModule, and the
masked BCE loss on top."""

import sys

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

REF = "/root/reference"
D, H, L, B, V = 16, 8, 6, 8, 90
HEADS = 8  # reference hard-codes 8 heads (model_seq.py:348-350)


@pytest.fixture(scope="module")
def ref_model_seq():
    sys.path.insert(0, REF)
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self
    # model_seq.py:369 hard-codes device="cuda" in torch.ones
    orig_ones = torch.ones

    def ones_cpu(*a, **kw):
        if str(kw.get("device", "")).startswith("cuda"):
            kw["device"] = "cpu"
        return orig_ones(*a, **kw)

    torch.ones = ones_cpu
    import model_seq

    yield model_seq
    torch.ones = orig_ones
    sys.path.remove(REF)


def _copy_log2feats(sac, enc, n_blocks=2):
    """flax SasrecEncoder params -> reference Log2feats module."""
    with torch.no_grad():
        sac.pos_emb.weight.copy_(torch.as_tensor(np.asarray(enc["pos_emb"])))
        for i in range(n_blocks):
            ln = enc[f"attn_ln_{i}"]
            sac.attention_layernorms[i].weight.copy_(
                torch.as_tensor(np.asarray(ln["scale"])))
            sac.attention_layernorms[i].bias.copy_(
                torch.as_tensor(np.asarray(ln["bias"])))
            at = enc[f"attn_{i}"]
            sac.attention_layers[i].in_proj_weight.copy_(
                torch.as_tensor(np.asarray(at["in_proj_kernel"])).T)
            sac.attention_layers[i].in_proj_bias.copy_(
                torch.as_tensor(np.asarray(at["in_proj_bias"])))
            sac.attention_layers[i].out_proj.weight.copy_(
                torch.as_tensor(np.asarray(at["out_proj_kernel"])).T)
            sac.attention_layers[i].out_proj.bias.copy_(
                torch.as_tensor(np.asarray(at["out_proj_bias"])))
            ln = enc[f"ffn_ln_{i}"]
            sac.forward_layernorms[i].weight.copy_(
                torch.as_tensor(np.asarray(ln["scale"])))
            sac.forward_layernorms[i].bias.copy_(
                torch.as_tensor(np.asarray(ln["bias"])))
            ff = enc[f"ffn_{i}"]
            for tc, fc in ((sac.forward_layers[i].conv1, ff["conv1"]),
                           (sac.forward_layers[i].conv2, ff["conv2"])):
                tc.weight.copy_(
                    torch.as_tensor(np.asarray(fc["kernel"])).T[:, :, None])
                tc.bias.copy_(torch.as_tensor(np.asarray(fc["bias"])))
        sac.last_layernorm.weight.copy_(
            torch.as_tensor(np.asarray(enc["last_ln"]["scale"])))
        sac.last_layernorm.bias.copy_(
            torch.as_tensor(np.asarray(enc["last_ln"]["bias"])))


def _copy_head(tm, hp):
    with torch.no_grad():
        tm.fc[0].weight.copy_(torch.as_tensor(np.asarray(hp["fc1_kernel"])).T)
        tm.fc[0].bias.copy_(torch.as_tensor(np.asarray(hp["fc1_bias"])))
        tm.fc[2].weight.copy_(torch.as_tensor(np.asarray(hp["fc2_kernel"])).T)
        tm.fc[2].bias.copy_(torch.as_tensor(np.asarray(hp["fc2_bias"])))


def test_sasrec_forward_matches_reference(ref_model_seq, rng):
    from amid_tpu.config import ModelConfig
    from amid_tpu.models.amid import build_model

    cfg = ModelConfig(
        backbone="sasrec", emb_dim=D, hid_dim=H, seq_len=L, batch_size=B,
        item_length=V // 2, user_length=V // 2, sasrec_heads=HEADS,
        kernels="xla",
    )
    model = build_model(cfg)
    num_neg = 3
    batch = {
        "target": jnp.asarray(rng.integers(0, V, B, dtype=np.int32)),
        "neg_samples": jnp.asarray(
            rng.integers(0, V, (B, num_neg), dtype=np.int32)),
        "seq_d1": jnp.asarray(rng.integers(1, V, (B, L), dtype=np.int32)),
        "seq_d2": jnp.asarray(rng.integers(1, V, (B, L), dtype=np.int32)),
    }
    key = jax.random.PRNGKey(3)
    params = model.init({"params": key, "dropout": key}, batch, train=False)[
        "params"
    ]
    out = model.apply({"params": params}, batch, train=False)

    ref = ref_model_seq.SASRec(
        user_length=V, user_emb_dim=D, item_length=V, item_emb_dim=D,
        seq_len=L, hid_dim=H, bs=B, isInC=False, isItC=False,
        threshold1=0.5, threshold2=0.5,
    )
    ref.eval()
    with torch.no_grad():
        ref.item_emb_layer.emb_item.weight.copy_(
            torch.as_tensor(np.asarray(params["item_embedding"])))
    _copy_log2feats(ref.sac1, params["enc_d1"])
    _copy_log2feats(ref.sac2, params["enc_d2"])
    _copy_head(ref.predictModule, params["predict"])

    t = lambda k: torch.as_tensor(np.asarray(batch[k]).astype(np.int64))  # noqa: E731
    with torch.no_grad():
        p1, p2 = ref(
            torch.zeros(B, dtype=torch.long), t("target"), t("neg_samples"),
            t("seq_d1"), t("seq_d2"),
            torch.ones(B, dtype=torch.long), torch.ones(B, dtype=torch.long),
            False,
        )
    np.testing.assert_allclose(
        np.asarray(out["logits_d1"]), p1.numpy(), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(out["logits_d2"]), p2.numpy(), rtol=2e-4, atol=2e-6)

    # masked BCE loss parity on the same predictions (train_sr.py:210-215)
    from amid_tpu.train.losses import masked_bce_loss

    labels = np.zeros((B, 1 + num_neg), np.float32)
    labels[:, 0] = 1.0
    dom = rng.integers(0, 2, B).astype(np.int32)
    got = float(masked_bce_loss(
        out["logits_d1"], out["logits_d2"], jnp.asarray(labels),
        jnp.asarray(dom)))
    crit = torch.nn.BCELoss(reduce=False)
    lt = torch.as_tensor(labels)
    m1 = torch.as_tensor((1 - dom)[:, None].astype(np.float32))
    m2 = torch.as_tensor(dom[:, None].astype(np.float32))
    want = float(torch.mean(crit(p1, lt) * m1 + crit(p2, lt) * m2))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sasrec_grads_match_reference(ref_model_seq, rng):
    """Backward parity: d(masked BCE)/d(params) computed by jax.grad vs
    torch autograd on the weight-copied reference model — item table,
    in_proj of block 0, and the head's fc2."""
    from amid_tpu.config import ModelConfig
    from amid_tpu.models.amid import build_model
    from amid_tpu.train.losses import masked_bce_loss

    cfg = ModelConfig(
        backbone="sasrec", emb_dim=D, hid_dim=H, seq_len=L, batch_size=B,
        item_length=V // 2, user_length=V // 2, sasrec_heads=HEADS,
        kernels="xla", sasrec_dropout=0.0,
    )
    model = build_model(cfg)
    num_neg = 2
    batch = {
        "target": jnp.asarray(rng.integers(0, V, B, dtype=np.int32)),
        "neg_samples": jnp.asarray(
            rng.integers(0, V, (B, num_neg), dtype=np.int32)),
        "seq_d1": jnp.asarray(rng.integers(1, V, (B, L), dtype=np.int32)),
        "seq_d2": jnp.asarray(rng.integers(1, V, (B, L), dtype=np.int32)),
    }
    key = jax.random.PRNGKey(5)
    params = model.init({"params": key, "dropout": key}, batch, train=False)[
        "params"
    ]
    labels = np.zeros((B, 1 + num_neg), np.float32)
    labels[:, 0] = 1.0
    dom = rng.integers(0, 2, B).astype(np.int32)

    def loss_fn(p):
        out = model.apply({"params": p}, batch, train=False)
        return masked_bce_loss(
            out["logits_d1"], out["logits_d2"], jnp.asarray(labels),
            jnp.asarray(dom))

    jgrads = jax.grad(loss_fn)(params)

    ref = ref_model_seq.SASRec(
        user_length=V, user_emb_dim=D, item_length=V, item_emb_dim=D,
        seq_len=L, hid_dim=H, bs=B, isInC=False, isItC=False,
        threshold1=0.5, threshold2=0.5,
    )
    ref.eval()  # dropout off; grads still flow
    with torch.no_grad():
        ref.item_emb_layer.emb_item.weight.copy_(
            torch.as_tensor(np.asarray(params["item_embedding"])))
    _copy_log2feats(ref.sac1, params["enc_d1"])
    _copy_log2feats(ref.sac2, params["enc_d2"])
    _copy_head(ref.predictModule, params["predict"])

    t = lambda k: torch.as_tensor(np.asarray(batch[k]).astype(np.int64))  # noqa: E731
    p1, p2 = ref(
        torch.zeros(B, dtype=torch.long), t("target"), t("neg_samples"),
        t("seq_d1"), t("seq_d2"),
        torch.ones(B, dtype=torch.long), torch.ones(B, dtype=torch.long),
        False,
    )
    crit = torch.nn.BCELoss(reduce=False)
    lt = torch.as_tensor(labels)
    m1 = torch.as_tensor((1 - dom)[:, None].astype(np.float32))
    m2 = torch.as_tensor(dom[:, None].astype(np.float32))
    loss = torch.mean(crit(p1, lt) * m1 + crit(p2, lt) * m2)
    loss.backward()

    np.testing.assert_allclose(
        np.asarray(jgrads["item_embedding"]),
        ref.item_emb_layer.emb_item.weight.grad.numpy(),
        rtol=1e-3, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(jgrads["enc_d1"]["attn_0"]["in_proj_kernel"]),
        ref.sac1.attention_layers[0].in_proj_weight.grad.numpy().T,
        rtol=1e-3, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(jgrads["predict"]["fc2_kernel"]),
        ref.predictModule.fc[2].weight.grad.numpy().T,
        rtol=1e-3, atol=1e-6,
    )
