#!/usr/bin/env python
"""Scaling harness: flagship train step across mesh sizes.

Two modes:
* default (TPU): single-chip examples/s on the real chip (the only hardware
  available here) — matches bench.py.
* --cpu-mesh: runs the FULL sharded train step (dp over `data`, row-sharded
  item table over `model`) on 1/2/4/8 virtual CPU devices with a synthetic
  table (--items, default 1M; the 50M north-star config runs the same code
  path — 50M x 128 fp32 = 25.6 GB, which needs >= 8 real chips' HBM at 3.2
  GB/shard). On virtual CPU devices this validates partitioning, memory
  layout and collective insertion, not speed; real multi-chip throughput
  requires a pod slice.

Prints one line per mesh config.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_mesh(n_devices: int, model_par: int, items: int, batch: int,
             seq_len: int, lazy: bool = False, remat: bool = False,
             device_loop: bool = False) -> float:
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from amid_tpu.config import MeshConfig, ModelConfig
    from amid_tpu.models.amid import build_model
    from amid_tpu.parallel.mesh import DATA_AXIS, make_mesh, param_shardings
    from amid_tpu.train.steps import TrainState, make_train_step

    devices = jax.devices()[:n_devices]
    mesh = make_mesh(MeshConfig(model_axis=model_par), devices=devices)
    cfg = ModelConfig(
        backbone="sasrec", emb_dim=128, hid_dim=32, seq_len=seq_len,
        batch_size=batch, is_itc=True, ts2=0.4, is_dr=True,
        item_length=items // 2, user_length=items // 2, kernels="xla",
        remat=remat,
    )
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    v = cfg.item_table_size
    batch_arrays = {
        "target": rng.integers(0, v, batch).astype(np.int32),
        "neg_samples": rng.integers(0, v, (batch, 1)).astype(np.int32),
        "seq_d1": rng.integers(0, v, (batch, seq_len)).astype(np.int32),
        "seq_d2": rng.integers(0, v, (batch, seq_len)).astype(np.int32),
        "domain_id": rng.integers(0, 2, batch).astype(np.int32),
        "reject": np.full((batch, 4), 1 << 20, np.int32),
        "reject_counts": np.zeros(batch, np.int32),
        "ob_label": np.ones(batch, np.int32),
    }
    pool_len = 1 << 20
    pools = np.sort(rng.integers(0, v, (2, pool_len)), axis=1).astype(np.int32)
    pool_sizes = np.array([pool_len, pool_len], np.int32)

    key = jax.random.PRNGKey(0)
    model_batch = {
        k: jnp.asarray(batch_arrays[k])
        for k in ("target", "neg_samples", "seq_d1", "seq_d2")
    }
    tx = optax.adam(5e-4)

    # Initialize the state ALREADY SHARDED: params in their own jit with
    # out_shardings (each device materializes only its row shard of the
    # table), then the Adam moments eagerly — zeros_like follows the
    # table's sharding with no transient. At the 50M north-star config the
    # table+moments are 3 x 25.6 GB; an init-then-relayout (or one jit
    # holding RNG bits + floats + both zero moments at once) transiently
    # exceeds host RAM (oom-killed at 122 GB on the first attempt).
    def init_params(key):
        return model.init({"params": key, "dropout": key}, model_batch,
                          train=False)["params"]

    abstract_p = jax.eval_shape(init_params, key)
    params = jax.jit(
        init_params, out_shardings=param_shardings(mesh, abstract_p)
    )(key)
    if lazy:
        from amid_tpu.train.lazy import init_lazy_state

        state = init_lazy_state(params, tx)
    else:
        state = TrainState(params, tx.init(params), None)
    del params
    bsh = NamedSharding(mesh, P(DATA_AXIS))
    batch_dev = {k: jax.device_put(jnp.asarray(v_), bsh)
                 for k, v_ in batch_arrays.items()}
    repl = NamedSharding(mesh, P())
    pools_dev = jax.device_put(jnp.asarray(pools), repl)
    sizes_dev = jax.device_put(jnp.asarray(pool_sizes), repl)

    if lazy:
        from amid_tpu.train.lazy import make_lazy_train_step

        step = make_lazy_train_step(model, tx, 5e-4, dr_e_w=0.01)
    else:
        step = make_train_step(model, tx, dr_e_w=0.01)
    state, m = step(state, batch_dev, pools_dev, sizes_dev, key)  # compile
    float(m["loss"])  # host fetch: the only true sync through the TPU tunnel
    if device_loop:
        # Same load-robust harness as bench.py: lax.scan carries the state
        # on device, one dispatch for all iters (CLAUDE.md host-load note).
        iters = 50

        def body(s, i):
            s2, m2 = step(s, batch_dev, pools_dev, sizes_dev,
                          jax.random.fold_in(key, 100 + i))
            return s2, m2["loss"]

        @jax.jit
        def loop(s):
            _, ls = jax.lax.scan(body, s, jnp.arange(iters))
            return ls[-1]

        compiled = loop.lower(state).compile()
        float(compiled(state))  # warmup
        dts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(compiled(state))
            dts.append(time.perf_counter() - t0)
        return iters * batch / min(dts)
    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step(state, batch_dev, pools_dev, sizes_dev,
                        jax.random.fold_in(key, i))
    float(m["loss"])
    return iters * batch / (time.perf_counter() - t0)


if __name__ == "__main__":
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-mesh", action="store_true")
    ap.add_argument("--weak", action="store_true",
                    help="weak scaling: global batch = --batch * data shards")
    ap.add_argument("--items", type=int, default=1_000_000)
    ap.add_argument("--items-sweep", type=str, default="",
                    help="comma list of table sizes to sweep on the chip, "
                         "e.g. 894820,2000000,4000000,8000000 (largest-"
                         "fitting single-chip table, SURVEY §7)")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--seq_len", type=int, default=20)
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize encoder blocks (activation memory "
                         "<-> recompute; the batch-8192 50M config needs it)")
    ap.add_argument("--lazy", action="store_true",
                    help="lazy table Adam (the production big-table config: "
                         "no dense table grad; required to fit 50M rows)")
    ap.add_argument("--mesh", type=str, default="",
                    help="single 'NxMP' config instead of the default list, "
                         "e.g. 8x8 for the 50M functional step")
    ap.add_argument("--out", type=str, default="")
    ap.add_argument("--host_loop", action="store_true",
                    help="per-step dispatch with state donation instead of "
                         "the timing scan. The scan harness keeps a second "
                         "copy of the state alive (the jitted loop's arg "
                         "is not donated so reps can reuse it), which "
                         "HALVES the largest table that fits vs the real "
                         "trainer step (donate_argnums=(0,)); use this for "
                         "fit-boundary probes — timings are only honest on "
                         "an idle host (CLAUDE.md host-load note)")
    a = ap.parse_args()

    if a.cpu_mesh:
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        import jax

        jax.config.update("jax_platforms", "cpu")
        configs = [(1, 1), (2, 1), (2, 2), (4, 2), (8, 2)]
    else:
        import jax

        configs = [(1, 1)]
    if a.mesh:
        n_, mp_ = a.mesh.split("x")
        configs = [(int(n_), int(mp_))]

    results = []
    items_list = (
        [int(x) for x in a.items_sweep.split(",")] if a.items_sweep
        else [a.items]
    )
    for items in items_list:
        for n, mp in configs:
            if n > len(jax.devices()):
                continue
            bs = a.batch * (n // mp) if a.weak else a.batch
            try:
                # chip runs get the device-loop harness (load-robust); the
                # CPU-mesh mode keeps the host loop (virtual devices
                # timeshare 2 cores either way — those numbers demonstrate
                # partitioning, not speed)
                eps = run_mesh(n, mp, items, bs, a.seq_len, lazy=a.lazy,
                               remat=a.remat,
                               device_loop=not a.cpu_mesh and not a.host_loop)
            except Exception as e:  # noqa: BLE001 — OOM ends the sweep
                print(f"devices={n} items={items:,}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                break
            row = dict(devices=n, model_par=mp, items=items, batch=bs,
                       lazy=a.lazy, remat=a.remat,
                       harness=("device_loop"
                                if not a.cpu_mesh and not a.host_loop
                                else "host_loop"),
                       examples_per_s=round(eps, 1))
            results.append(row)
            print(
                f"devices={n} mesh=({n // mp}x{mp} dp x tp) items={items:,} "
                f"batch={bs}: {eps:,.0f} examples/s", flush=True,
            )
    if a.out:
        os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
        with open(a.out, "w") as f:
            json.dump(results, f, indent=2)
