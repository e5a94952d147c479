"""TN sensitivity + semaphore strategy for the per-row scatter DMA kernel."""
import sys, os, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.bench_kernels import device_time_carry

rng = np.random.default_rng(0)
V, D, U = 894820, 128, 8192
table = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
uniq = jnp.asarray(np.unique(rng.integers(0, V, 10752).astype(np.int32))[:U])
upd = jnp.asarray(rng.normal(size=(U, D)).astype(np.float32) * 1e-6)


def make_scatter(tn, shared_sem=False):
    def kernel(v, ids_ref, upd_ref, tin, table_ref, sems):
        i = pl.program_id(0)
        for p in range(tn):
            @pl.when(ids_ref[i * tn + p] < v)
            def _(p=p):
                pltpu.make_async_copy(
                    upd_ref.at[p], table_ref.at[ids_ref[i * tn + p]],
                    sems if shared_sem else sems.at[p],
                ).start()
        for p in range(tn):
            @pl.when(ids_ref[i * tn + p] < v)
            def _(p=p):
                pltpu.make_async_copy(
                    upd_ref.at[p], table_ref.at[ids_ref[i * tn + p]],
                    sems if shared_sem else sems.at[p],
                ).wait()

    def scatter(t, ids, rows):
        v, d = t.shape
        n = ids.shape[0]
        return pl.pallas_call(
            functools.partial(kernel, v),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n // tn,),
                in_specs=[
                    pl.BlockSpec((tn, d), lambda i, ids: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=[
                    pltpu.SemaphoreType.DMA
                    if shared_sem else pltpu.SemaphoreType.DMA((tn,))
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((v, d), t.dtype),
            input_output_aliases={2: 0},
        )(ids, rows, t)

    return scatter


def probe(c):
    return jnp.sum(jnp.take(c[0], uniq[:8], axis=0))


for tn in (16, 64, 256, 512):
    for shared in (False, True):
        sc = make_scatter(tn, shared)
        f = lambda c: (sc(c[0], uniq, upd * (1.0 + 1e-9 * c[1])), c[1] + 1)
        name = f"pallas TN={tn}{' shared-sem' if shared else ''}"
        try:
            dt = device_time_carry(f, (table, jnp.float32(0)), probe)
            print(f"{name:28s}: {dt*1e6:8.0f} us  {dt*1e9/U:6.1f} ns/row",
                  flush=True)
        except Exception as e:
            print(f"{name:28s}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
