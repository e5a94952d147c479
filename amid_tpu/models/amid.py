"""AMID model assembly: shared item embedding -> per-domain encoders ->
InnerComp/InterComp message passing -> mean-pool -> prediction heads.

Backbone control flow mirrors the reference exactly:
* GRU4Rec  (model_seq.py:83-113): InC before the GRUs, ItC after.
* SASRec   (model_seq.py:416-443): InC before Log2feats, ItC after.
* BERT4Rec (model_seq.py:277-309): InC before, ItC *before* the transformer
  stack, with the key mask rebuilt for the doubled length.

Forward returns 2 logits tensors, or 6 when is_dr (main + IPS propensity +
imputation heads, model_seq.py:436-440).

The item table is a single shared embedding for both domains (ids are
pre-offset at data-prep time, model_seq.py:22-29). Lookup goes through
amid_tpu.parallel.embedding.embedding_lookup so the same model code serves the
replicated (single-chip) and row-sharded (model-parallel) paths.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from amid_tpu.config import ModelConfig
from amid_tpu.models.comp import InnerComp, InterComp
from amid_tpu.models.encoders import (
    Bert4RecEncoder,
    GruEncoder,
    SasrecEncoder,
)
from amid_tpu.models.heads import PredictHead
from amid_tpu.ops.torch_compat import torch_embedding_init

Batch = dict[str, Any]


class AMIDModel(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(
        self, batch: Batch, train: bool = True, features_only: bool = False
    ):
        """features_only=True returns the pooled per-domain user
        representations (u_feat_enhance_d1/d2, model_seq.py:432-434) — the
        serving entry point (amid_tpu.serve scores them against the full
        catalog) — instead of candidate logits."""
        cfg = self.cfg
        fn = self._features if features_only else self._forward
        # On TPU, f32 matmuls already run at bf16 input precision / fp32
        # accumulate by default (MXU-native DEFAULT precision) — an explicit
        # "bfloat16" context is a measured no-op there (bit-identical
        # metrics, results/bf16_drive*). use_bf16 keeps that opt-in for
        # non-TPU backends; matmul_precision overrides explicitly (e.g.
        # "highest" forces true-fp32 3-pass matmuls).
        precision = cfg.matmul_precision or ("bfloat16" if cfg.use_bf16 else "")
        if precision:
            with jax.default_matmul_precision(precision):
                return fn(batch, train)
        return fn(batch, train)

    def _forward(self, batch: Batch, train: bool) -> dict[str, jax.Array]:
        cfg = self.cfg
        u_d1, u_d2 = self._features(batch, train)

        def lookup(ids):
            from amid_tpu.parallel.embedding import embedding_lookup

            return embedding_lookup(self._item_table(), ids)

        i_feat = lookup(batch["target"])[:, None, :]  # [B, 1, D]
        neg_feat = lookup(batch["neg_samples"])  # [B, K, D]
        cand = jnp.concatenate([i_feat, neg_feat], axis=1)  # [B, 1+K, D]

        out = {"u_d1": u_d1, "u_d2": u_d2}
        out["logits_d1"], out["logits_d2"] = PredictHead(
            cfg.hid_dim, cfg.kernels, name="predict"
        )(u_d1, u_d2, cand)
        if cfg.is_dr:
            out["ips_d1"], out["ips_d2"] = PredictHead(
                cfg.hid_dim, cfg.kernels, name="predict_ips"
            )(u_d1, u_d2, cand)
            out["gfunc_d1"], out["gfunc_d2"] = PredictHead(
                cfg.hid_dim, cfg.kernels, name="predict_gfunc"
            )(u_d1, u_d2, cand)
        return out

    def _item_table(self):
        # Declared once (by whichever of _features/_forward runs first);
        # subsequent calls read the existing variable.
        if self.has_variable("params", "item_embedding"):
            return self.get_variable("params", "item_embedding")
        cfg = self.cfg
        from amid_tpu.parallel import context as spmd_context

        ctx = spmd_context.current()
        rows = cfg.item_table_size // (ctx.model_shards if ctx else 1)
        return self.param(
            "item_embedding", torch_embedding_init, (rows, cfg.emb_dim)
        )

    def _features(self, batch: Batch, train: bool):
        cfg = self.cfg
        det = not train

        # Inside a shard_map SPMD region this module sees only its row shard
        # of the table (declared with the local shape; init runs outside the
        # region with the full shape).
        item_emb = self._item_table()

        def lookup(ids):
            from amid_tpu.parallel.embedding import embedding_lookup

            return embedding_lookup(item_emb, ids)

        seq_d1 = lookup(batch["seq_d1"])  # [B, L, D]
        seq_d2 = lookup(batch["seq_d2"])

        if cfg.is_inc:
            seq_d1 = InnerComp(
                cfg.batch_size, cfg.ts1, cfg.kernels,
                cfg.comp_broadcast_quirk, name="inc_d1",
            )(seq_d1)
            seq_d2 = InnerComp(
                cfg.batch_size, cfg.ts1, cfg.kernels,
                cfg.comp_broadcast_quirk, name="inc_d2",
            )(seq_d2)

        if cfg.backbone == "gru4rec":
            seq_d1 = GruEncoder(cfg.emb_dim, name="enc_d1")(seq_d1)
            seq_d2 = GruEncoder(cfg.emb_dim, name="enc_d2")(seq_d2)
            seq_d1, seq_d2 = self._apply_itc(seq_d1, seq_d2)
        elif cfg.backbone == "sasrec":
            enc_len = cfg.enc_seq_len
            seq_d1 = SasrecEncoder(
                enc_len, cfg.sasrec_blocks, cfg.sasrec_heads, cfg.sasrec_dropout,
                cfg.kernels, cfg.remat, name="enc_d1",
            )(seq_d1, det)
            seq_d2 = SasrecEncoder(
                enc_len, cfg.sasrec_blocks, cfg.sasrec_heads, cfg.sasrec_dropout,
                cfg.kernels, cfg.remat, name="enc_d2",
            )(seq_d2, det)
            seq_d1, seq_d2 = self._apply_itc(seq_d1, seq_d2)
        elif cfg.backbone == "bert4rec":
            # Key-padding mask from raw ids. Reference uses seq_d2's ids for
            # BOTH towers (model_seq.py:286-294) — kept behind the quirk flag.
            mask_src_d1 = batch["seq_d2"] if cfg.bert_d2_mask_quirk else batch["seq_d1"]
            mask_src_d2 = batch["seq_d2"]
            reps = seq_d1.shape[1] // batch["seq_d2"].shape[1]  # 2 if InC else 1
            key_mask_d1 = jnp.tile(mask_src_d1 > 0, (1, reps))
            key_mask_d2 = jnp.tile(mask_src_d2 > 0, (1, reps))
            seq_d1, seq_d2 = self._apply_itc(seq_d1, seq_d2)
            if cfg.is_itc:  # ItC doubled the length (model_seq.py:294)
                key_mask_d1 = jnp.tile(mask_src_d1 > 0, (1, 2 * reps))
                key_mask_d2 = jnp.tile(mask_src_d2 > 0, (1, 2 * reps))
            seq_d1 = Bert4RecEncoder(
                cfg.bert_blocks, cfg.bert_heads, cfg.bert_ff_dim, cfg.bert_dropout,
                cfg.kernels, name="enc_d1",
            )(seq_d1, key_mask_d1, det)
            seq_d2 = Bert4RecEncoder(
                cfg.bert_blocks, cfg.bert_heads, cfg.bert_ff_dim, cfg.bert_dropout,
                cfg.kernels, name="enc_d2",
            )(seq_d2, key_mask_d2, det)
        else:
            raise ValueError(f"unknown backbone {cfg.backbone!r}")

        u_d1 = jnp.mean(seq_d1, axis=1)  # plain mean incl. pad positions
        u_d2 = jnp.mean(seq_d2, axis=1)  # (model_seq.py:432-434)
        return u_d1, u_d2

    def _apply_itc(self, seq_d1, seq_d2):
        cfg = self.cfg
        if not cfg.is_itc:
            return seq_d1, seq_d2
        d1 = InterComp(
            cfg.batch_size, cfg.ts2, cfg.kernels,
            cfg.comp_broadcast_quirk, name="itc_d1",
        )(seq_d1, seq_d2)
        d2 = InterComp(
            cfg.batch_size, cfg.ts2, cfg.kernels,
            cfg.comp_broadcast_quirk, name="itc_d2",
        )(seq_d2, seq_d1)
        return d1, d2


def build_model(cfg: ModelConfig) -> AMIDModel:
    """Resolve kernels='auto' against the runtime backend (pallas kernels on
    TPU, XLA elsewhere — each dispatch site further applies its measured
    shape thresholds) and construct the model."""
    if cfg.kernels == "auto":
        import dataclasses

        import jax

        resolved = "pallas" if jax.default_backend() == "tpu" else "xla"
        cfg = dataclasses.replace(cfg, kernels=resolved)
    return AMIDModel(cfg)
