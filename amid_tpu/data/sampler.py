"""Device-side negative sampling — exact uniform over (pool - user items).

Reference semantics (dataset_seq.py:197-203): negatives are drawn uniformly
from the active domain's item pool minus all of the user's items in that
domain (including the held-out target) — 1 at train, `neg_nums` at eval, per
row, via python `random.sample` in DataLoader workers.

TPU-native version: the packed dataset stores each row's user-item *positions
in its sorted domain pool* ("holes", ascending, sentinel-padded —
amid_tpu.data.packed). Sampling the j-th valid element of pool-minus-holes is
the classic skip-sorted-holes scheme:

    j ~ U[0, pool_size - num_holes)
    idx = j;  for each hole h ascending:  idx += (h <= idx)

One ascending pass is exact: each increment can only move idx past holes that
are processed later. The whole step is a [B, K] vector fori over the hole
width — no host round-trip, no retry loop, zero collisions even for
pathological pools.

Remaining deviation from `random.sample`: draws within a row are i.i.d.
(sampling WITH replacement) rather than without; for the AMID eval shapes
(999 draws from >=20k-item valid sets) the expected duplicate count is ~2% of
draws and affects ranks at distribution level only (SURVEY.md §7
"exact-match eval"). Empirically bounded (results/sampler_wr.json,
tools/exp_sampler_wr.py): scoring the committed loan_fund-DR seed-3 weights
over the full 999-neg test pass, 3 draws each scheme, the worst per-metric
|i.i.d. - without-replacement| delta is 0.0012 (hit_10_d2, i.i.d. the
slightly easier direction as duplicates shrink the distinct-negative set) —
~2x the draw noise (std <= 0.0004 per scheme) and well under the ~0.004
seed-to-seed std of the committed 5-seed tables, so the deviation stays
distribution-level as claimed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_negatives(
    key: jax.Array,
    pools: jax.Array,  # [2, P] sorted per-domain item pools
    pool_sizes: jax.Array,  # [2]
    domain_id: jax.Array,  # [B]
    reject: jax.Array,  # [B, R] ascending hole positions, sentinel-padded
    num_neg: int,
    reject_counts: jax.Array | None = None,  # [B]; derived if None
) -> jax.Array:
    """Returns [B, num_neg] int32 item ids."""
    b = domain_id.shape[0]
    p = pools.shape[1]
    if reject_counts is None:
        reject_counts = jnp.sum(reject < p, axis=1)

    valid = pool_sizes[domain_id] - reject_counts  # [B]
    valid = jnp.maximum(valid, 1)
    u = jax.random.uniform(key, (b, num_neg))
    j = jnp.minimum((u * valid[:, None]).astype(jnp.int32), valid[:, None] - 1)

    def skip_hole(r, idx):
        h = reject[:, r][:, None]  # [B, 1]
        return idx + (h <= idx).astype(jnp.int32)

    idx = jax.lax.fori_loop(0, reject.shape[1], skip_hole, j)
    return pools[domain_id[:, None], idx]


def interleave_corr_seq(real_seq: jax.Array, fake_seq: jax.Array) -> jax.Array:
    """C2DSR corrupted-sequence interleave (dataset_seq.py:276-281):
    [r0, f0, r1, f1, ...] -> [B, 2L]. Used with `sample_negatives(...,
    num_neg=L)` as the fake sequence for the C2DSR contrastive objective."""
    b, l = real_seq.shape
    return jnp.stack([real_seq, fake_seq], axis=-1).reshape(b, 2 * l)
