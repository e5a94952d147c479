"""C2DSR mode: corrupted-sequence views + contrastive infomax objective.

Reference surface reproduced (data semantics): DualDomainSeqDatasetC2DSR
(dataset_seq.py:283-441) emits, per row,

* ``corr_seq``     — seq_len items sampled uniformly from the active domain's
                     pool minus the user's items (dataset_seq.py:358,380);
* ``corr_seq_d1``  — generate_corr_seq(padded seq_d1, corr_seq): elementwise
                     interleave [r0, f0, r1, f1, ...] (dataset_seq.py:276-281,
                     382);
* ``corr_seq_d2``  — same with seq_d2 (:383);
* ``all_seq``      — generate_corr_seq(seq_d1, seq_d2) (:384).

TPU-native layout: nothing changes in the packed dataset or loader — the
corrupted items are sampled ON DEVICE inside the jit step with the same
hole-skipping sampler used for negatives (amid_tpu.data.sampler, uniform over
pool-minus-user-items; i.i.d. draws instead of without-replacement — same
documented deviation), and the interleaves are two-line jnp reshapes.

Objective: the reference ships this dataset with NO executable trainer (the
contrastive family in utils.py:70-168 is dead code, and no __main__ consumes
collate_fn_enhanceC2DSR), so the objective here follows the C2DSR paper's
mutual-information discriminator (Cao et al., CIKM'22), built from the
pooled tower features this model already produces:

    h1, h2   = tower features of the true per-domain sequences
    ha1, ha2 = tower features of ``all_seq`` (the interleaved dual-domain
               view), each through its own tower
    hc1, hc2 = tower features of the corrupted views corr_seq_d1/2

    L_cl = mean[ softplus(-(ha1.h1)) + softplus(hc1.h1)        (domain 1)
               + softplus(-(ha2.h2)) + softplus(hc2.h2) ]      (domain 2)

i.e. a dot-product critic with BCE-with-logits: the cross-domain view must
agree with the in-domain representation; the corrupted view must not.
Enabled with --isC2DSR (+ --cl_w weight); adds 3 extra encoder passes at
length 2L (ModelConfig.enc_seq_len doubles so the SASRec position table
covers the interleaved views).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from amid_tpu.data.sampler import interleave_corr_seq, sample_negatives


def c2dsr_views(batch: dict, corr: jax.Array) -> dict[str, jax.Array]:
    """Interleaved views (dataset_seq.py:276-281,382-384): corr is [B, L]
    device-sampled corrupted items."""
    return {
        "corr_seq_d1": interleave_corr_seq(batch["seq_d1"], corr),
        "corr_seq_d2": interleave_corr_seq(batch["seq_d2"], corr),
        "all_seq": interleave_corr_seq(batch["seq_d1"], batch["seq_d2"]),
    }


def sample_corr(key, pools, pool_sizes, batch) -> jax.Array:
    """Corrupted items: seq_len uniform draws from the active domain pool
    minus the user's items (dataset_seq.py:358,380)."""
    return sample_negatives(
        key, pools, pool_sizes, batch["domain_id"], batch["reject"],
        batch["seq_d1"].shape[1], batch.get("reject_counts"),
    )


def infomax_loss(h1, h2, ha1, ha2, hc1, hc2) -> jax.Array:
    """Dot-product-critic MI discriminator (module docstring): BCE-with-
    logits, positives (ha_x, h_x), negatives (hc_x, h_x)."""
    def dot(a, b):
        return jnp.sum(a * b, axis=-1)

    pos = jax.nn.softplus(-dot(ha1, h1)) + jax.nn.softplus(-dot(ha2, h2))
    neg = jax.nn.softplus(dot(hc1, h1)) + jax.nn.softplus(dot(hc2, h2))
    return jnp.mean(pos + neg)


def c2dsr_loss(model, params, batch, views, h1, h2, k_drop, train: bool):
    """Encode the interleaved views through the towers (features_only) and
    apply the infomax loss against the true-tower features h1/h2."""
    def feats(seq_d1, seq_d2):
        return model.apply(
            {"params": params},
            {**batch, "seq_d1": seq_d1, "seq_d2": seq_d2},
            train=train,
            features_only=True,
            rngs={"dropout": k_drop},
        )

    ha1, ha2 = feats(views["all_seq"], views["all_seq"])
    hc1, hc2 = feats(views["corr_seq_d1"], views["corr_seq_d2"])
    return infomax_loss(h1, h2, ha1, ha2, hc1, hc2)
