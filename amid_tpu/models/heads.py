"""Prediction heads.

predictModule (model_seq.py:32-54): sigmoid(MLP([user ; item])) with one
shared MLP scored twice — once with the domain-1 user repr, once with the
domain-2 repr — against the same [target ; negatives] candidate bank.

TPU-native detail: the concat [B, C, 2D] is never materialized. The first
layer's kernel [2D, H] is split into user/item halves, so the head is

    h = relu(u @ K_u + i @ K_i + b1)        # [B, C, H], u part broadcast
    logits = sigmoid(h @ k2 + b2)           # [B, C]

which is algebraically identical (cat(u, i) @ K == u @ K_u + i @ K_i) and
keeps the candidate loop as two MXU matmuls. Init matches torch Linear with
fan_in = 2D.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


# Measured on v5e (tools/bench_kernels.py, B=256 C=1000): XLA 1.50ms vs the
# fused pallas kernel 2.01ms — both are VPU-width-bound on the H=32 hidden
# lanes, and XLA's fusion wins. XLA is the production path; 'force_pallas'
# keeps the kernel exercisable for development.
PALLAS_SCORING_MIN_C = 256


class PredictHead(nn.Module):
    hid_dim: int
    kernels: str = "xla"

    @nn.compact
    def __call__(
        self, user_d1: jax.Array, user_d2: jax.Array, item_feat: jax.Array
    ) -> tuple[jax.Array, jax.Array]:
        """user_d*: [B, D]; item_feat: [B, C, D] -> (logits_d1, logits_d2),
        each [B, C]."""
        d = user_d1.shape[-1]
        h = self.hid_dim
        bound1 = 1.0 / math.sqrt(2 * d)  # torch Linear(2D, H)
        bound2 = 1.0 / math.sqrt(h)

        def uinit(bound):
            def init(key, shape, dtype=jnp.float32):
                return jax.random.uniform(key, shape, dtype, -bound, bound)

            return init

        k1 = self.param("fc1_kernel", uinit(bound1), (2 * d, h))
        b1 = self.param("fc1_bias", uinit(bound1), (h,))
        k2 = self.param("fc2_kernel", uinit(bound2), (h, 1))
        b2 = self.param("fc2_bias", uinit(bound2), (1,))

        k_user, k_item = k1[:d], k1[d:]

        if (
            self.kernels == "force_pallas"
            and item_feat.shape[1] >= PALLAS_SCORING_MIN_C
        ):
            from amid_tpu.ops.pallas_scoring import scoring_head_pallas

            return (
                scoring_head_pallas(user_d1, item_feat, k_user, k_item, b1, k2, b2),
                scoring_head_pallas(user_d2, item_feat, k_user, k_item, b1, k2, b2),
            )

        i_part = jnp.einsum(
            "bcd,dh->bch", item_feat, k_item, preferred_element_type=jnp.float32
        )

        def score(u):
            u_part = u @ k_user  # [B, H]
            hidden = nn.relu(u_part[:, None, :] + i_part + b1)
            return jax.nn.sigmoid(
                jnp.einsum(
                    "bch,ho->bco", hidden, k2, preferred_element_type=jnp.float32
                )[..., 0]
                + b2[0]
            )

        return score(user_d1), score(user_d2)
