#!/usr/bin/env python
"""Phase-by-phase RSS diagnosis of the 50M-row CPU-mesh lazy step.

The combined run was oom-killed at ~122 GB twice; this isolates which
phase (sharded param init / moment alloc / step compile / step exec)
carries the transient. Usage: python tools/exp_50m_phases.py [items]."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np


def rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6
    return -1.0


def hwm_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmHWM"):
                return int(line.split()[1]) / 1e6
    return -1.0


def main() -> None:
    items = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from amid_tpu.config import MeshConfig, ModelConfig
    from amid_tpu.models.amid import build_model
    from amid_tpu.parallel.mesh import make_mesh, param_shardings
    from amid_tpu.train.lazy import init_lazy_state, make_lazy_train_step

    batch, seq_len = 8192, 20
    mesh = make_mesh(MeshConfig(model_axis=8), devices=jax.devices())
    cfg = ModelConfig(
        backbone="sasrec", emb_dim=128, hid_dim=32, seq_len=seq_len,
        batch_size=batch, is_itc=True, ts2=0.4, is_dr=True,
        item_length=items // 2, user_length=items // 2, kernels="xla",
    )
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    v = cfg.item_table_size
    print(f"[0] start rss={rss_gb():.1f} hwm={hwm_gb():.1f}", flush=True)

    model_batch = {
        "target": jnp.asarray(rng.integers(0, v, batch).astype(np.int32)),
        "neg_samples": jnp.asarray(
            rng.integers(0, v, (batch, 1)).astype(np.int32)),
        "seq_d1": jnp.asarray(
            rng.integers(0, v, (batch, seq_len)).astype(np.int32)),
        "seq_d2": jnp.asarray(
            rng.integers(0, v, (batch, seq_len)).astype(np.int32)),
    }
    key = jax.random.PRNGKey(0)

    def init_params(key):
        return model.init({"params": key, "dropout": key}, model_batch,
                          train=False)["params"]

    abstract_p = jax.eval_shape(init_params, key)
    params = jax.jit(
        init_params, out_shardings=param_shardings(mesh, abstract_p)
    )(key)
    jax.block_until_ready(params)
    print(f"[1] params init rss={rss_gb():.1f} hwm={hwm_gb():.1f}", flush=True)

    tx = optax.adam(5e-4)
    state = init_lazy_state(params, tx)
    del params
    jax.block_until_ready(state)
    print(f"[2] moments rss={rss_gb():.1f} hwm={hwm_gb():.1f}", flush=True)

    batch_arrays = dict(model_batch)
    batch_arrays["domain_id"] = jnp.asarray(
        rng.integers(0, 2, batch).astype(np.int32))
    batch_arrays["reject"] = jnp.full((batch, 4), 1 << 20, jnp.int32)
    batch_arrays["reject_counts"] = jnp.zeros(batch, jnp.int32)
    batch_arrays["ob_label"] = jnp.ones(batch, jnp.int32)
    pool_len = 1 << 20
    pools = jnp.asarray(np.sort(
        rng.integers(0, v, (2, pool_len)), axis=1).astype(np.int32))
    sizes = jnp.asarray(np.array([pool_len, pool_len], np.int32))
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data"))
    batch_dev = {k: jax.device_put(v_, bsh) for k, v_ in batch_arrays.items()}
    pools = jax.device_put(pools, repl)
    sizes = jax.device_put(sizes, repl)

    step = make_lazy_train_step(model, tx, 5e-4, dr_e_w=0.01)
    lowered = step.lower(state, batch_dev, pools, sizes, key)
    print(f"[3] lowered rss={rss_gb():.1f} hwm={hwm_gb():.1f}", flush=True)
    compiled = lowered.compile()
    print(f"[4] compiled rss={rss_gb():.1f} hwm={hwm_gb():.1f}", flush=True)
    mem = compiled.memory_analysis()
    if mem is not None:
        print(f"    xla: args={mem.argument_size_in_bytes/1e9:.1f}GB "
              f"out={mem.output_size_in_bytes/1e9:.1f}GB "
              f"temp={mem.temp_size_in_bytes/1e9:.1f}GB "
              f"alias={getattr(mem, 'alias_size_in_bytes', 0)/1e9:.1f}GB",
              flush=True)
    state, m = compiled(state, batch_dev, pools, sizes, key)
    print(f"[5] step1 loss={float(m['loss']):.4f} rss={rss_gb():.1f} "
          f"hwm={hwm_gb():.1f}", flush=True)


def main_split() -> None:
    """Split-scatter variant: the fused production step OOMs at 50M on the
    CPU mesh because XLA-CPU's buffer assignment copies table/mu/nu before
    the in-step scatters (the gather reads them earlier in the same
    program) — temp = 8.3 GB/device x 8 devices on top of the 77 GB state.
    Here the row updates are computed in one jit (table read-only) and each
    scatter runs in its own donated jit whose ONLY op is the scatter, so
    in-place aliasing is guaranteed. Mirrors train/lazy.py::_make_lazy_step
    math (phase A, Adam, bias correction); production keeps the fused step —
    on the real TPU the pallas scatter kernel aliases explicitly and the
    fused step's temp is row-scale (see PERF.md)."""
    items = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000_000
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from amid_tpu.config import MeshConfig, ModelConfig
    from amid_tpu.data.sampler import sample_negatives
    from amid_tpu.models.amid import build_model
    from amid_tpu.parallel import context
    from amid_tpu.parallel.mesh import make_mesh, param_shardings
    from amid_tpu.train import losses
    from amid_tpu.train.lazy import _unique_budget, init_lazy_state
    from amid_tpu.train.steps import _make_labels, _model_batch

    seq_len = 20
    mesh = make_mesh(MeshConfig(model_axis=8), devices=jax.devices())
    cfg = ModelConfig(
        backbone="sasrec", emb_dim=128, hid_dim=32, seq_len=seq_len,
        batch_size=batch, is_itc=True, ts2=0.4, is_dr=True,
        item_length=items // 2, user_length=items // 2, kernels="xla",
    )
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    v = cfg.item_table_size
    print(f"[0] split start items={items:,} rss={rss_gb():.1f}", flush=True)

    model_batch = {
        "target": jnp.asarray(rng.integers(0, v, batch).astype(np.int32)),
        "neg_samples": jnp.asarray(
            rng.integers(0, v, (batch, 1)).astype(np.int32)),
        "seq_d1": jnp.asarray(
            rng.integers(0, v, (batch, seq_len)).astype(np.int32)),
        "seq_d2": jnp.asarray(
            rng.integers(0, v, (batch, seq_len)).astype(np.int32)),
    }
    key = jax.random.PRNGKey(0)

    def init_params(key):
        return model.init({"params": key, "dropout": key}, model_batch,
                          train=False)["params"]

    abstract_p = jax.eval_shape(init_params, key)
    params = jax.jit(
        init_params, out_shardings=param_shardings(mesh, abstract_p)
    )(key)
    jax.block_until_ready(params)
    print(f"[1] params init rss={rss_gb():.1f} hwm={hwm_gb():.1f}",
          flush=True)
    tx = optax.adam(5e-4)
    state = init_lazy_state(params, tx)
    del params
    jax.block_until_ready(state)
    print(f"[2] moments rss={rss_gb():.1f} hwm={hwm_gb():.1f}", flush=True)

    batch_arrays = dict(model_batch)
    batch_arrays["domain_id"] = jnp.asarray(
        rng.integers(0, 2, batch).astype(np.int32))
    batch_arrays["reject"] = jnp.full((batch, 4), 1 << 20, jnp.int32)
    batch_arrays["reject_counts"] = jnp.zeros(batch, jnp.int32)
    batch_arrays["ob_label"] = jnp.ones(batch, jnp.int32)
    pool_len = 1 << 20
    pools = jnp.asarray(np.sort(
        rng.integers(0, v, (2, pool_len)), axis=1).astype(np.int32))
    sizes = jnp.asarray(np.array([pool_len, pool_len], np.int32))
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data"))
    batch_dev = {k: jax.device_put(v_, bsh) for k, v_ in batch_arrays.items()}
    pools = jax.device_put(pools, repl)
    sizes = jax.device_put(sizes, repl)
    labels = _make_labels(batch, 1)
    lr, b1, b2, eps = 5e-4, 0.9, 0.999, 1e-8
    TABLE = "item_embedding"

    @jax.jit
    def compute(state, batch, pools, pool_sizes, key):
        params = state.params
        table = params[TABLE]
        opt = state.opt_state
        k_neg, k_drop = jax.random.split(key)
        neg = sample_negatives(
            k_neg, pools, pool_sizes, batch["domain_id"], batch["reject"],
            1, batch.get("reject_counts"))
        all_ids = jnp.concatenate([
            batch["target"].reshape(-1), neg.reshape(-1),
            batch["seq_d1"].reshape(-1), batch["seq_d2"].reshape(-1)])
        u_budget = _unique_budget(batch["target"].shape[0], seq_len, 1)
        uids = jnp.unique(all_ids, size=u_budget, fill_value=v)
        safe = jnp.minimum(uids, v - 1)
        rows = jnp.take(table, safe, axis=0)
        dense = {k: p for k, p in params.items() if k != TABLE}

        def loss_fn(dense_params, rows):
            full = dict(dense_params)
            full[TABLE] = jax.lax.stop_gradient(table)
            with context.lazy_rows(uids, rows):
                out = model.apply({"params": full}, _model_batch(batch, neg),
                                  train=True, rngs={"dropout": k_drop})
            loss = losses.masked_bce_loss(
                out["logits_d1"], out["logits_d2"], labels, batch["domain_id"])
            return loss + 0.01 * losses.dr_e_loss(
                out, labels, batch["domain_id"])

        loss, (g_dense, g_rows) = jax.value_and_grad(
            loss_fn, argnums=(0, 1))(dense, rows)
        updates, dense_opt = tx.update(g_dense, opt.dense_opt, dense)
        dense_new = optax.apply_updates(dense, updates)
        count = opt.count + 1
        mu_rows = jnp.take(opt.mu, safe, axis=0)
        nu_rows = jnp.take(opt.nu, safe, axis=0)
        mu_new = b1 * mu_rows + (1 - b1) * g_rows
        nu_new = b2 * nu_rows + (1 - b2) * g_rows**2
        c = count.astype(jnp.float32)
        upd = lr * (mu_new / (1 - b1**c)) / (
            jnp.sqrt(nu_new / (1 - b2**c)) + eps)
        return uids, rows - upd, mu_new, nu_new, dense_new, dense_opt, \
            count, loss

    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def scatter(arr, uids, vals):
        return arr.at[uids].set(vals, mode="drop")

    out = compute(state, batch_dev, pools, sizes, key)
    uids, t_rows, mu_new, nu_new, dense_new, dense_opt, count, loss = out
    print(f"[3] compute loss={float(loss):.4f} rss={rss_gb():.1f} "
          f"hwm={hwm_gb():.1f}", flush=True)
    table_new = scatter(state.params[TABLE], uids, t_rows)
    mu_t = scatter(state.opt_state.mu, uids, mu_new)
    nu_t = scatter(state.opt_state.nu, uids, nu_new)
    jax.block_until_ready((table_new, mu_t, nu_t))
    print(f"[4] scatters applied rss={rss_gb():.1f} hwm={hwm_gb():.1f} — "
          f"50M-row sharded init+step complete", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--split":
        main_split()
    else:
        main()
