"""Pallas TPU kernel for the sampled scoring head.

predictModule (model_seq.py:32-54) scores each user representation against
1+K candidate items: sigmoid(W2 @ relu(W1 @ [u; i] + b1) + b2). At eval
K = 999 and the XLA path streams a [B, 1+K, H] hidden tensor through HBM.
This kernel fuses both matmuls + relu + sigmoid over candidate tiles in VMEM:

  grid (B/TB, C/TC); per cell the [TC, D] candidate slab and the [TB, D]
  user slab produce logits [TB, TC] without materializing hidden state.

The first-layer kernel is split into user/item halves (algebraically equal
to the concat form — amid_tpu.models.heads). The backward pass is plain XLA
(the same matmuls transposed; they're MXU-shaped already) via custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TB = 8
_TC = 128


def _pad(x, mult, axis=0):
    rem = (-x.shape[axis]) % mult
    if rem:
        pad_widths = [(0, 0)] * x.ndim
        pad_widths[axis] = (0, rem)
        x = jnp.pad(x, pad_widths)
    return x


def _scoring_fwd_pallas(user, items, k_user, k_item, b1, k2, b2):
    """user [B, D]; items [B, C, D] -> [B, C].

    Grid (B/TB, C/TC): each cell scores a [TB, D] user slab against its own
    [TB, TC, D] candidate slab (candidates are per-row)."""
    bsz, c, d = items.shape
    h = k_user.shape[1]
    items_p = _pad(_pad(items, _TC, axis=1), _TB, axis=0)
    user_p = _pad(user, _TB, axis=0)
    bp, cp = items_p.shape[0], items_p.shape[1]

    out = pl.pallas_call(
        _scoring_kernel,
        grid=(bp // _TB, cp // _TC),
        in_specs=[
            pl.BlockSpec((_TB, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TB, _TC, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, h), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, h), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_TB, _TC), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, cp), jnp.float32),
    )(user_p, items_p, k_user, k_item, b1.reshape(1, -1), k2, b2.reshape(1, 1))
    return out[:bsz, :c]


def _scoring_kernel(u_ref, i_ref, ku_ref, ki_ref, b1_ref, k2_ref, b2_ref,
                    o_ref):
    u_part = jnp.dot(u_ref[:], ku_ref[:], preferred_element_type=jnp.float32)
    for p in range(u_ref.shape[0]):
        i_part = jnp.dot(
            i_ref[p], ki_ref[:], preferred_element_type=jnp.float32
        )  # [TC, H]
        hidden = jnp.maximum(u_part[p][None, :] + i_part + b1_ref[:], 0.0)
        logit = jnp.dot(hidden, k2_ref[:], preferred_element_type=jnp.float32)
        o_ref[p, :] = jax.nn.sigmoid(logit[:, 0] + b2_ref[0, 0])


@jax.custom_vjp
def scoring_head_pallas(user, items, k_user, k_item, b1, k2, b2):
    return _scoring_fwd_pallas(user, items, k_user, k_item, b1, k2, b2)


def _fwd(user, items, k_user, k_item, b1, k2, b2):
    out = _scoring_fwd_pallas(user, items, k_user, k_item, b1, k2, b2)
    return out, (user, items, k_user, k_item, b1, k2, b2, out)


def _bwd(res, g):
    user, items, k_user, k_item, b1, k2, b2, out = res
    # Recompute hidden (cheap, MXU-shaped) and backprop in plain XLA.
    u_part = user @ k_user  # [B, H]
    i_part = jnp.einsum("bcd,dh->bch", items, k_item)
    pre = u_part[:, None, :] + i_part + b1
    hidden = jax.nn.relu(pre)
    # d sigmoid
    dlogit = g * out * (1.0 - out)  # [B, C]
    dk2 = jnp.einsum("bch,bc->h", hidden, dlogit)[:, None]
    db2 = jnp.sum(dlogit)[None]
    dhidden = dlogit[..., None] * k2[None, None, :, 0]  # [B, C, H]
    dpre = dhidden * (pre > 0)
    db1 = jnp.sum(dpre, axis=(0, 1))
    du_part = jnp.sum(dpre, axis=1)  # [B, H]
    duser = du_part @ k_user.T
    dk_user = user.T @ du_part
    ditems = jnp.einsum("bch,dh->bcd", dpre, k_item)
    dk_item = jnp.einsum("bcd,bch->dh", items, dpre)
    return duser, ditems, dk_user, dk_item, db1, dk2, db2


scoring_head_pallas.defvjp(_fwd, _bwd)
