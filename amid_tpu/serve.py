"""Full-catalog top-K retrieval — the serving path.

The reference only ever scores 1+K sampled candidates (model_seq.py:40-54);
production retrieval needs each user's top-K over the ENTIRE item catalog.
This scores the catalog in item tiles against the user representations with
the same predictModule math (split-kernel MLP); the full [B, V] score
matrix never materializes.

Per-tile selection is `lax.approx_max_k` (the TPU PartialReduce op) followed
by an exact [2k]-merge of the carry — measured on chip (tools/bench_serve.py,
results/serve_bench.json + serve_bench_fused.json): the first sort-based
formulation (lax.top_k over [carry ++ tile]) spent 159-262 ms/batch in
per-tile sorts; approx_max_k selection plus the measured best tile size
(262144) brings the same retrieval to **15.95 ms/batch** at the mybank
catalog (894,820 x 128, B=256, k=100), 31.9 ms end-to-end for both domains
including the backbone feature pass. `method="exact"` keeps the sort-based
path (the oracle for tests). approx_max_k's per-tile recall target is 0.95
by default and misses only scores inside the same PartialReduce bin as the
k-th best; tests pin observed recall vs the dense oracle (measured 1.0 at
k=100 on the mybank catalog).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _score_tile(u_part, items, k_item, b1, k2, b2):
    """u_part [B, H]; items [T, D] -> scores [B, T].

    The H-contraction is written as multiply+sum rather than einsum; the
    matched-tile A/B (serve_bench.json vs serve_bench_fused.json: 43.68 vs
    43.87 ms @16384, 92.58 vs 92.64 ms @8192) showed NO difference — XLA
    already fuses the broadcast+relu+contraction either way. The measured
    serve win came from the tile-size sweep (15.95 ms/batch at tile=262144
    vs 43.7 at 16384): larger tiles amortize per-tile selection/merge and
    raise table-read bandwidth (4.9 → 28.7 GB/s). Same math as
    PredictHead/model_seq.py:32-54."""
    i_part = jnp.einsum("td,dh->th", items, k_item,
                        preferred_element_type=jnp.float32)
    hidden = jax.nn.relu(u_part[:, None, :] + i_part[None, :, :] + b1)
    return jax.nn.sigmoid(
        jnp.sum(hidden * k2[None, None, :, 0], axis=-1) + b2[0]
    )


@functools.partial(jax.jit, static_argnames=("k", "tile", "method"))
def full_catalog_topk(
    user_repr: jax.Array,  # [B, D] (u_feat_enhance_d1 or _d2)
    item_table: jax.Array,  # [V, D]
    head_params: dict,  # PredictHead params: fc1_kernel/fc1_bias/fc2_kernel/fc2_bias
    k: int = 100,
    tile: int = 262144,  # measured best on chip (serve_bench_fused.json)
    method: str = "approx",  # "approx" (TPU PartialReduce) | "exact" (sort)
) -> tuple[jax.Array, jax.Array]:
    """Returns (scores [B, k], item_ids [B, k]), best-first."""
    d = user_repr.shape[1]
    v = item_table.shape[0]
    k1 = head_params["fc1_kernel"]
    k_user, k_item = k1[:d], k1[d:]
    b1, k2, b2 = (
        head_params["fc1_bias"], head_params["fc2_kernel"],
        head_params["fc2_bias"],
    )
    u_part = user_repr @ k_user  # [B, H]

    # The default tile is tuned for ~1M-row catalogs (serve_bench_fused
    # sweep); clamp to the catalog so small catalogs don't pad every pass
    # to a 262144-row multiple of wasted HBM/compute (lane-align to 128).
    # Measured at an amazon-scale 41,950-row catalog, B=256: 1.06 ms/batch
    # clamped vs 3.56 for the padded-to-262144 equivalent (3.36x).
    tile = min(tile, max(-(-v // 128) * 128, 128))
    n_tiles = -(-v // tile)
    v_pad = n_tiles * tile
    table = jnp.pad(item_table, ((0, v_pad - v), (0, 0)))

    def body(carry, t_idx):
        top_s, top_i = carry
        start = t_idx * tile
        items = jax.lax.dynamic_slice(table, (start, 0), (tile, d))
        s = _score_tile(u_part, items, k_item, b1, k2, b2)  # [B, tile]
        ids = start + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        ids = jnp.broadcast_to(ids, s.shape)
        # mask catalog padding
        s = jnp.where(ids < v, s, -jnp.inf)
        if method == "approx" and tile > k:
            # tile -> k via PartialReduce (no sort), then an exact 2k merge
            t_s, pos = jax.lax.approx_max_k(s, k)
            t_i = jnp.take_along_axis(ids, pos, axis=1)
            cat_s = jnp.concatenate([top_s, t_s], axis=1)
            cat_i = jnp.concatenate([top_i, t_i], axis=1)
        else:
            cat_s = jnp.concatenate([top_s, s], axis=1)
            cat_i = jnp.concatenate([top_i, ids], axis=1)
        new_s, pos = jax.lax.top_k(cat_s, k)
        new_i = jnp.take_along_axis(cat_i, pos, axis=1)
        return (new_s, new_i), None

    b = user_repr.shape[0]
    init = (
        jnp.full((b, k), -jnp.inf, jnp.float32),
        jnp.full((b, k), -1, jnp.int32),
    )
    (top_s, top_i), _ = jax.lax.scan(body, init, jnp.arange(n_tiles))
    return top_s, top_i


def user_representations(model, params, batch, train: bool = False):
    """Pooled (u_d1, u_d2) user features for serving — runs the backbone
    only (no candidate scoring). batch needs seq_d1/seq_d2 only."""
    return model.apply({"params": params}, batch, train, features_only=True)
