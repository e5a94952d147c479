"""Pallas kernels vs XLA reference paths (interpret mode on CPU; the same
kernels compile natively on TPU — exercised by bench/verify runs)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from jax.experimental.pallas import tpu as pltpu


def test_affinity_kernel_matches_xla(rng):
    from amid_tpu.ops.affinity import max_affinity_xla
    from amid_tpu.ops.pallas_affinity import max_affinity_pallas

    a = jnp.asarray(rng.normal(size=(16, 8, 128)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(16, 8, 128)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(max_affinity_pallas(a, b))
    want = np.asarray(max_affinity_xla(a, b))
    # kernel computes in bf16 (matching TPU XLA default matmul precision)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-1)


def test_affinity_smalln_kernel_matches_xla(rng):
    """The VMEM-resident small-N variant (peer bank held on-chip),
    dispatched by max_affinity under force_pallas when smalln_fits()."""
    from amid_tpu.ops.affinity import max_affinity_xla
    from amid_tpu.ops.pallas_affinity import (
        max_affinity_pallas_smalln, smalln_fits,
    )

    a = jnp.asarray(rng.normal(size=(16, 8, 128)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(16, 6, 128)).astype(np.float32))
    assert smalln_fits(16, 8, 16, 6, 128)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(max_affinity_pallas_smalln(a, b))
    want = np.asarray(max_affinity_xla(a, b, chunk=1))
    assert got.shape == (16, 16)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-1)


def test_affinity_kernel_ragged_batch(rng):
    """Batch not a multiple of the tile: padding rows must not leak."""
    from amid_tpu.ops.affinity import max_affinity_xla
    from amid_tpu.ops.pallas_affinity import max_affinity_pallas

    a = jnp.asarray(rng.normal(size=(11, 4, 128)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(13, 4, 128)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(max_affinity_pallas(a, b))
    want = np.asarray(max_affinity_xla(a, b, chunk=1))
    assert got.shape == (11, 13)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-1)
