"""One-off experiment: scatter variants on the real chip.

Hypotheses from the 2026-08-18 bench (results/final_bench_kernels.txt):
XLA scatter ~0.37us/row vs its own gather at 0.034us/row. Is the gap
(a) XLA not knowing ids are unique/sorted, (b) per-row DMA issue cost
(pallas kernel pays it too), or (c) fundamental write-path cost?
"""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from tools.bench_kernels import device_time_carry
from amid_tpu.ops.pallas_scatter import scatter_set_unique_pallas

rng = np.random.default_rng(0)
V, D, U = 894820, 128, 8192
table = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
uniq = jnp.asarray(np.unique(rng.integers(0, V, 10752).astype(np.int32))[:U])
upd = jnp.asarray(rng.normal(size=(U, D)).astype(np.float32) * 1e-6)


def probe(c):
    t, _ = c
    return jnp.sum(jnp.take(t, uniq[:8], axis=0))


def mk(update):
    return lambda c: (update(c[0], c[1]), c[1] + 1)


cases = [
    ("xla set (no hints)",
     lambda t, s: t.at[uniq].set(upd * (1.0 + 1e-9 * s))),
    ("xla set unique_indices",
     lambda t, s: t.at[uniq].set(upd * (1.0 + 1e-9 * s), unique_indices=True)),
    ("xla set unique+sorted",
     lambda t, s: t.at[uniq].set(upd * (1.0 + 1e-9 * s), unique_indices=True,
                                 indices_are_sorted=True)),
    ("xla add unique+sorted",
     lambda t, s: t.at[uniq].add(upd * (1.0 + 1e-9 * s), unique_indices=True,
                                 indices_are_sorted=True)),
    ("pallas TN=16",
     lambda t, s: scatter_set_unique_pallas(t, uniq, upd * (1.0 + 1e-9 * s))),
]
for name, update in cases:
    try:
        dt = device_time_carry(mk(update), (table, jnp.float32(0)), probe)
        print(f"{name:28s}: {dt*1e6:8.0f} us  {dt*1e9/U:6.1f} ns/row", flush=True)
    except Exception as e:
        print(f"{name:28s}: FAILED {type(e).__name__}: {e}", flush=True)
