"""Auxiliary losses from the reference's utility layer (utils.py:70-260).

These are dead code in the reference's current trainers (sce_loss is bound at
train_sr.py:183 but never applied; the contrastive family belongs to an
earlier model iteration) but are part of the public component inventory, so
the TPU build ships working equivalents for users who enable them.

Implemented (well-defined members only):
* sce_loss            (utils.py:170-180) — scaled cosine error.
* info_nce_loss       (utils.py:137-151, `cal_loss_cl_refine`) — normalized
  in-batch InfoNCE with temperature 0.07, diagonal positives.
* contrastive_margin_loss (utils.py:210-244, `ContrastiveLoss`) — siamese
  margin loss.
* cross_feature_cl_loss (utils.py:70-135, `cal_loss_cl_all`) — 1-vs-7
  feature-slot contrastive CE (query slot m1..m4 against the other slots).

(`cal_loss_cl`, utils.py:153-168, references an undefined global and cannot
be executed in the reference; it is intentionally not reproduced.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _l2norm(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def sce_loss(x: jax.Array, y: jax.Array, alpha: float = 3.0) -> jax.Array:
    """mean((1 - cos(x, y))^alpha) (utils.py:170-180)."""
    x = _l2norm(x)
    y = _l2norm(y)
    return jnp.mean((1.0 - jnp.sum(x * y, axis=-1)) ** alpha)


def info_nce_loss(a: jax.Array, b: jax.Array, temperature: float = 0.07) -> jax.Array:
    """In-batch InfoNCE with diagonal positives (utils.py:137-151):
    -log(exp(sim_ii/t) / sum_j exp(sim_ij/t)), sims on l2-normalized rows."""
    a = _l2norm(a)
    b = _l2norm(b)
    logits = jnp.exp((a @ b.T) / temperature)
    pos = jnp.diagonal(logits)
    neg = jnp.sum(logits, axis=1)
    return jnp.mean(-jnp.log(pos / neg))


def contrastive_margin_loss(
    x0: jax.Array, x1: jax.Array, y: jax.Array, margin: float = 1.0
) -> jax.Array:
    """Siamese margin loss (utils.py:231-244): y*d^2 + (1-y)*max(m-d, 0)^2,
    summed and halved per row."""
    diff = x0 - x1
    dist_sq = jnp.sum(diff**2, axis=1)
    dist = jnp.sqrt(dist_sq)
    mdist = jnp.clip(margin - dist, 0.0)
    loss = y * dist_sq + (1.0 - y) * mdist**2
    return jnp.sum(loss) / 2.0 / x0.shape[0]


def cross_feature_cl_loss(feats_d1: list[jax.Array], feats_d2: list[jax.Array]) -> jax.Array:
    """`cal_loss_cl_all` (utils.py:70-135): for each feature slot m, score its
    d1 representation against [own d2 (positive), all other slots' d1/d2
    (negatives)] with a dot product and take CE at label 0; sum over slots."""
    n = len(feats_d1)
    slots = list(zip(feats_d1, feats_d2))
    total = 0.0
    for m, (q_d1, q_d2) in enumerate(slots):
        keys = [q_d2]
        for j, (o_d1, o_d2) in enumerate(slots):
            if j != m:
                keys.extend([o_d1, o_d2])
        key_mat = jnp.stack(keys, axis=-1)  # [B, D, K]
        logits = jnp.einsum("bd,bdk->bk", q_d1, key_mat)
        labels = jnp.zeros(logits.shape[0], jnp.int32)
        total = total + jnp.mean(
            -jax.nn.log_softmax(logits, axis=-1)[jnp.arange(logits.shape[0]), labels]
        )
    return total
