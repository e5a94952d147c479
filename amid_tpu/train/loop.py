"""Training drivers: the train_sr / train_sr_dr equivalents.

Protocol reproduced from the reference:
* per-epoch: full pass over the train loader, then eval (train_sr.py:187-223);
  DR adds a second pass over the DR loader stepping optimizer2, then a second
  eval (train_sr_dr.py:362-403).
* best-metric tracking takes the per-metric max over epochs
  (train_sr.py:224-270).
* 5-seed protocol with mean/std aggregation (train_sr.py:439-443,549-569).

New over the reference: real checkpointing (orbax), examples/s accounting,
no host sync inside the step loop.
"""

from __future__ import annotations


from typing import Optional

import jax
import numpy as np
import optax

from amid_tpu.config import TrainConfig
from amid_tpu.data.loader import BatchIterator
from amid_tpu.data.packed import PackedDualDomainDataset, load_dual_domain_csv
from amid_tpu.models.amid import build_model
from amid_tpu.train.metrics import RankAccumulator
from amid_tpu.train.steps import (
    TrainState,
    init_state,
    make_dr_r_step,
    make_eval_step,
    make_resident_chunk_runner,
    make_scanned_eval,
    make_train_step,
)
from amid_tpu.utils.logging import AverageMeter, init_logger


def _device_pools(ds: PackedDualDomainDataset):
    import jax.numpy as jnp

    return jnp.asarray(ds.pools), jnp.asarray(ds.pool_sizes)


def _sample_batch(ds: PackedDualDomainDataset, bs: int, num_neg: int = 1):
    """A shape-defining batch for model.init."""
    import jax.numpy as jnp

    arrays = {k: jnp.asarray(v[:bs]) for k, v in ds.batch_arrays().items()}
    arrays["neg_samples"] = jnp.zeros((bs, num_neg), jnp.int32)
    return {
        "target": arrays["target"],
        "neg_samples": arrays["neg_samples"],
        "seq_d1": arrays["seq_d1"],
        "seq_d2": arrays["seq_d2"],
    }


def evaluate(
    eval_step,
    params,
    val_iter: BatchIterator,
    pools,
    pool_sizes,
    key,
    overlap_eval: bool,
    log=None,
    put=None,
) -> dict[str, float]:
    import time

    import jax.numpy as jnp

    acc = RankAccumulator(overlap_eval)
    val_losses = []
    t0 = time.perf_counter()
    t_dispatch = 0.0
    for i, batch in enumerate(val_iter):
        td = time.perf_counter()
        host_batch = batch  # host-side dom/ov: readable under any sharding
        if put is not None:
            batch = put(batch)
        out = eval_step(params, batch, pools, pool_sizes, jax.random.fold_in(key, i))
        t_dispatch += time.perf_counter() - td
        acc.add(
            out["ranks_fixed"], out["ranks_raw"],
            host_batch["domain_id"], host_batch["overlap"],
        )
        # defer the host fetch — all eval batches dispatch back-to-back
        val_losses.append(out["loss_cls"])
    t_iter = time.perf_counter() - t0 - t_dispatch
    tf = time.perf_counter()
    metrics = acc.finalize()
    # one stacked fetch instead of one ~1 ms tunnel round-trip per batch
    # (multi-process: fetch the replicated scalars individually — each is a
    # local read, there is no tunnel RTT to amortize, and it avoids
    # depending on eager multi-device stacking semantics. Eager lockstep
    # ops on global arrays DO work — the per-step 2-process trainer test
    # exercises the train loop's latch math — this is just the cheaper,
    # dependency-free form here.)
    if not val_losses:
        metrics["val_loss"] = 0.0
    elif jax.process_count() > 1:
        metrics["val_loss"] = float(np.mean([float(v) for v in val_losses]))
    else:
        metrics["val_loss"] = float(jnp.stack(val_losses).mean())
    if log is not None:
        log.debug(
            f"eval pass: batch-build {t_iter:.2f}s dispatch {t_dispatch:.2f}s "
            f"finalize+fetch {time.perf_counter() - tf:.2f}s"
        )
    return metrics


def evaluate_scanned(
    eval_all,
    params,
    batches_dev,
    dom: np.ndarray,
    ov: np.ndarray,
    pools,
    pool_sizes,
    key,
    overlap_eval: bool,
    log=None,
) -> dict[str, float]:
    """Fast-eval path: one compiled lax.scan over the device-resident val
    batches (steps.make_scanned_eval) — identical metrics to evaluate()
    (same per-batch fold_in(key, i) negative draws), no per-batch host
    slicing/dispatch."""
    import time

    t0 = time.perf_counter()
    out = eval_all(params, batches_dev, pools, pool_sizes, key)
    acc = RankAccumulator(overlap_eval)
    acc.add(
        np.asarray(out["ranks_fixed"]).reshape(-1),
        np.asarray(out["ranks_raw"]).reshape(-1),
        dom.reshape(-1),
        ov.reshape(-1),
    )
    metrics = acc.finalize()
    # np.asarray first: works for replicated multi-process arrays too,
    # where an eager .mean() over non-addressable devices would not
    metrics["val_loss"] = float(np.asarray(out["loss_cls"]).mean())
    if log is not None:
        log.debug(f"eval pass (scanned): {time.perf_counter() - t0:.2f}s")
    return metrics


def _run_chunked(
    runner,
    state,
    arrays_dev,
    perm_dev,
    nb: int,
    pools,
    pool_sizes,
    base_key,
    idx_offset: int,
    log_every: int,
    timer,
    batch_size: int,
    on_metrics,
    nan_cb,
):
    """Fast-train epoch driver (cfg.fast_train): one device program per
    log-cadence chunk of steps (steps.make_resident_chunk_runner) instead
    of per-step dispatch. The chunk boundary IS the loop path's
    log/NaN-check boundary (i % log_every == 0), so host syncs keep the
    same cadence — but there are ~log_every x fewer dispatches, and the
    DATA NEVER MOVES per step: the dataset is device-resident (put once
    per seed) and each epoch ships only the 4-byte/row permutation, with
    batches gathered on device inside the scan. Batch order, keys, and
    log sampling are identical to the loop; metric parity is exact on CPU
    (test_fast_train), float-rounding-level on TPU (different compiled
    program — see make_resident_chunk_runner)."""
    import jax.numpy as jnp

    start = 0
    while start < nb:
        end = min(start + log_every, nb)
        bidxs = jnp.arange(start, end)
        kidxs = jnp.arange(idx_offset + start, idx_offset + end)
        state, m0, nf = runner(state, arrays_dev, perm_dev, pools,
                               pool_sizes, base_key, kidxs, bidxs)
        if timer is not None:  # phase B passes None — the loop path only
            for _ in range(end - start):  # counts phase-A steps
                timer.step(batch_size)
        if float(nf) > 0.0:
            state = nan_cb(state, start)
        else:
            on_metrics(m0)
        start = end
    return state


class NonFiniteLossError(RuntimeError):
    pass


def _handle_nan(cfg, log, ckpt, state, epoch, step):
    """Failure detection (new vs reference, SURVEY §5): act on a non-finite
    train loss per cfg.nan_policy."""
    msg = f"non-finite train loss at epoch {epoch} step {step}"
    if cfg.nan_policy == "halt":
        raise NonFiniteLossError(msg)
    if cfg.nan_policy == "restore" and ckpt is not None:
        restored = ckpt.restore(state)
        if restored is not None:
            log.error(f"{msg}; rolled back to checkpoint "
                      f"{ckpt.latest_step()}")
            return restored
    log.error(f"{msg}; continuing (policy={cfg.nan_policy})")
    return state


def _track_best(best: dict[str, float], cur: dict[str, float]) -> None:
    for k, v in cur.items():
        if k.startswith(("hit_", "ndcg_", "mrr")):
            best[k] = max(best.get(k, 0.0), v)


def run_seed(
    cfg: TrainConfig,
    seed: int,
    train_ds: PackedDualDomainDataset,
    val_ds: PackedDualDomainDataset,
    dr_ds: Optional[PackedDualDomainDataset] = None,
    log=None,
    epoch_hook=None,
) -> dict[str, float]:
    """Train one seed; returns the best-metric dict (reference train()
    return contract, train_sr.py:352-355).

    epoch_hook(epoch, state, ev, phase): observability callback invoked
    after the main per-epoch eval (phase="main") and, on the DR schedule,
    again after the post-phase-B eval (phase="post_dr") — used by
    tools/transplant_eval.py to score the same weights under the
    reference's own test()."""
    log = log or init_logger(cfg.model_dir, f"log{seed}.txt")
    model = build_model(cfg.model)
    tx = optax.adam(cfg.lr)
    is_dr = cfg.model.is_dr
    tx2 = optax.adam(cfg.lr * cfg.lr2) if is_dr else None

    c2dsr_w = cfg.cl_w if cfg.model.is_c2dsr else None
    lazy = cfg.lazy_table_adam
    if lazy and c2dsr_w is not None:
        # the lazy unique-id budget doesn't cover the corrupted-view lookups
        raise ValueError("--isC2DSR is not supported with --lazy_table_adam")
    if lazy:
        from amid_tpu.train.lazy import (
            init_lazy_state, make_lazy_dr_r_step, make_lazy_train_step,
        )

        key = jax.random.PRNGKey(seed)
        sample = _sample_batch(train_ds, cfg.model.batch_size)
        params = model.init(
            {"params": key, "dropout": key}, sample, train=False
        )["params"]
        state = init_lazy_state(params, tx, tx2)
        train_step = make_lazy_train_step(
            model, tx, cfg.lr, dr_e_w=cfg.dr_e_w if is_dr else None,
            kernels=model.cfg.kernels,
        )
        dr_step = (
            make_lazy_dr_r_step(
                model, tx2, cfg.lr * cfg.lr2, kernels=model.cfg.kernels
            )
            if is_dr else None
        )
    else:
        state = init_state(
            model, cfg, tx, tx2, seed=seed,
            sample_batch=_sample_batch(train_ds, cfg.model.batch_size),
        )
        train_step = make_train_step(
            model, tx, dr_e_w=cfg.dr_e_w if is_dr else None, c2dsr_w=c2dsr_w
        )
        dr_step = make_dr_r_step(model, tx2) if is_dr else None
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    log.info(f"seed {seed}: params={n_params:,}")
    eval_step = make_eval_step(model, cfg.data.neg_nums)

    pools, pool_sizes = _device_pools(train_ds)
    # eval negatives come from the *val* split's pools (dataset_seq.py:141-142
    # — each Dataset builds pools from its own csv)
    vpools, vpool_sizes = _device_pools(val_ds)
    dpools, dpool_sizes = _device_pools(dr_ds) if dr_ds is not None else (None, None)

    # --- device-mesh training (SURVEY §2.5; new vs the single-GPU reference).
    # GSPMD: the SAME jit steps run sharded once state/batches carry mesh
    # shardings (XLA inserts the collectives — table-gather psums over
    # `model`, peer-bank all-gathers + grad psums over `data`).
    # shard_map: the steps are rebuilt around explicit collectives
    # (parallel/spmd.py) — dense Adam only.
    put = lambda b: b  # noqa: E731
    mesh = bsh = repl = None
    nproc = 1
    if cfg.use_mesh:
        from amid_tpu.parallel.mesh import (
            batch_sharding, make_mesh, replicated, state_shardings,
        )

        mesh = make_mesh(cfg.mesh)
        dsz = mesh.shape["data"]
        if cfg.model.batch_size % dsz:
            raise ValueError(
                f"batch_size {cfg.model.batch_size} not divisible by "
                f"data axis {dsz}"
            )
        if cfg.mesh_impl == "shard_map":
            if lazy:
                raise ValueError(
                    "mesh_impl=shard_map does not cover --lazy_table_adam; "
                    "use gspmd"
                )
            if c2dsr_w is not None:
                raise ValueError(
                    "mesh_impl=shard_map does not cover --isC2DSR; use gspmd"
                )
            from amid_tpu.parallel.spmd import (
                make_spmd_dr_r_step, make_spmd_eval_step, make_spmd_train_step,
            )

            train_step = make_spmd_train_step(
                model, tx, mesh, dr_e_w=cfg.dr_e_w if is_dr else None
            )
            dr_step = make_spmd_dr_r_step(model, tx2, mesh) if is_dr else None
            eval_step = make_spmd_eval_step(model, cfg.data.neg_nums, mesh)
        # Multi-process (multi-host slice / 2-process gloo test): every
        # process runs this same program with identical host data (loaders
        # and init are seed-deterministic), and put_global assembles global
        # arrays by handing each process's addressable shards their slice —
        # the make_array_from_process_local_data/host_local_slice semantics
        # generalized to every trainer sharding (test_distributed drives a
        # full DR run_seed across 2 real processes). Eval-step outputs are
        # forced replicated so every process can read its rank vectors.
        nproc = jax.process_count()
        if nproc > 1 and cfg.mesh_impl != "gspmd":
            raise ValueError("multi-process runs require mesh_impl=gspmd")
        from amid_tpu.parallel.distributed import put_global

        repl = replicated(mesh)
        bsh = batch_sharding(mesh)
        state = put_global(state, state_shardings(mesh, state))
        pools, pool_sizes = put_global((pools, pool_sizes), repl)
        vpools, vpool_sizes = put_global((vpools, vpool_sizes), repl)
        if dpools is not None:
            dpools, dpool_sizes = put_global((dpools, dpool_sizes), repl)
        put = lambda b: put_global(b, bsh)  # noqa: E731
        if nproc > 1:
            eval_step = jax.jit(
                make_eval_step(model, cfg.data.neg_nums, jit=False),
                out_shardings=repl,
            )
        log.info(
            f"mesh: {dict(mesh.shape)} impl={cfg.mesh_impl} processes={nproc}"
        )

    train_iter = BatchIterator(
        train_ds, cfg.model.batch_size, shuffle=True, seed=seed, drop_last=True
    )
    val_iter = BatchIterator(
        val_ds, cfg.model.batch_size, shuffle=False, seed=seed,
        drop_last=cfg.eval_batch_drop_last,
    )
    dr_iter = (
        BatchIterator(dr_ds, cfg.model.batch_size, shuffle=True, seed=seed + 1000)
        if dr_ds is not None
        else None
    )

    # Fast eval (cfg.fast_eval): the val loader is deterministic
    # (shuffle=False, drop_last=True), so stack its batches ONCE, park them
    # on device, and run each eval pass as a single lax.scan program.
    # Metric-identical to the loop path (same fold_in(key, i) draws —
    # test_fast_eval). GSPMD mesh runs scan too (the stacked [nb, bs, ...]
    # batches are pre-sharded P(None, data), so each scan slice comes out
    # batch-sharded exactly like the per-step path's device_put —
    # test_mesh_trainer pins parity); shard_map keeps the per-step loop
    # (its steps are prejitted around explicit collectives).
    scanned_eval = None
    mesh_scan_ok = not cfg.use_mesh or cfg.mesh_impl == "gspmd"
    if (
        cfg.fast_eval
        and mesh_scan_ok
        and cfg.eval_batch_drop_last
        and len(val_iter) > 0
    ):
        import jax.numpy as jnp_

        nbv = len(val_iter)
        bsv = cfg.model.batch_size
        varrays = val_ds.batch_arrays()
        vidx = np.arange(nbv * bsv).reshape(nbv, bsv)
        val_dom = varrays["domain_id"][vidx]
        val_ov = varrays["overlap"][vidx]
        if cfg.use_mesh:
            from jax.sharding import NamedSharding, PartitionSpec as P_

            stacked_sh = NamedSharding(mesh, P_(None, "data"))
            val_batches_dev = {
                k: put_global(jnp_.asarray(v[vidx]), stacked_sh)
                for k, v in varrays.items()
            }
        else:
            val_batches_dev = {
                k: jax.device_put(jnp_.asarray(v[vidx]))
                for k, v in varrays.items()
            }
        scanned_eval = make_scanned_eval(
            model, cfg.data.neg_nums,
            out_shardings=repl if nproc > 1 else None,
        )

    ckpt = None
    start_epoch = 0
    if cfg.checkpoint:
        from amid_tpu.train.checkpoint import CheckpointManager

        ckpt = CheckpointManager(
            f"{cfg.model_dir}/checkpoint/seed{seed}", keep=cfg.checkpoint_keep,
            async_save=cfg.checkpoint_async, payload=cfg.checkpoint_payload,
        )
        if cfg.resume:
            restored = ckpt.restore(state)
            if restored is not None:
                state = restored
                # latest_step() can legitimately be 0 — don't `or`-default it
                start_epoch = ckpt.latest_step() + 1
                log.info(f"resumed from checkpoint at epoch {start_epoch - 1}")

    # Fast train (cfg.fast_train): chunk the epoch into log-cadence scans
    # over the DEVICE-RESIDENT dataset (steps.make_resident_chunk_runner)
    # — per epoch only the permutation crosses the tunnel. GSPMD mesh runs
    # scan too: the resident arrays are REPLICATED on every device (the
    # per-step permutation gather addresses arbitrary rows) and the
    # gathered batch is sharding-constrained onto the `data` axis, so the
    # step partitions exactly as per-step dispatch does (VERDICT r4 #3 —
    # without this, multi-chip runs re-enter the host-dispatch-bound
    # regime). shard_map / profiling runs keep per-step dispatch.
    fast_train = cfg.fast_train and mesh_scan_ok and not cfg.profile_steps
    chunk_runner = dr_chunk_runner = None
    train_arrays_dev = dr_arrays_dev = None
    resident_put = (
        (lambda x: put_global(x, repl)) if cfg.use_mesh
        else jax.device_put
    )
    if fast_train:
        import jax.numpy as jnp_

        bsz = cfg.model.batch_size
        chunk_runner = make_resident_chunk_runner(
            train_step, bsz, batch_sharding=bsh if cfg.use_mesh else None
        )
        train_arrays_dev = {
            k: resident_put(jnp_.asarray(v))
            for k, v in train_iter.arrays().items()
        }
        if dr_step is not None and dr_iter is not None:
            dr_chunk_runner = make_resident_chunk_runner(
                dr_step, bsz, batch_sharding=bsh if cfg.use_mesh else None
            )
            dr_arrays_dev = {
                k: resident_put(jnp_.asarray(v))
                for k, v in dr_iter.arrays().items()
            }

    root_key = jax.random.PRNGKey(seed)
    best: dict[str, float] = {}
    best_score = -1.0
    from amid_tpu.utils.profiler import StepTimer

    timer = StepTimer()

    import jax.numpy as jnp

    for epoch in range(start_epoch, cfg.epochs):
        meter = AverageMeter()
        ekey = jax.random.fold_in(root_key, epoch)
        # Device-side latch: every step ORs its `nonfinite` flag in (one tiny
        # async op, no host sync); the host fetches it only at log cadence +
        # epoch end, so a NaN at ANY step is caught by the next fetch
        # (VERDICT r1 weak #3 — the old check sampled log steps only).
        latch = jnp.zeros((), jnp.float32)
        if fast_train:

            def _on_metrics(m0):
                meter.update(**{k: float(v) for k, v in m0.items()})
                log.info(
                    "train "
                    + ", ".join(
                        f"{k}:{meter.mean(k):.5f}" for k in sorted(m0)
                    )
                )

            import jax.numpy as jnp_

            perm_dev = resident_put(jnp_.asarray(train_iter.epoch_perm()))
            state = _run_chunked(
                chunk_runner, state, train_arrays_dev, perm_dev,
                len(train_iter), pools, pool_sizes,
                ekey, 0, cfg.log_every, timer, cfg.model.batch_size,
                _on_metrics,
                lambda s, i: _handle_nan(cfg, log, ckpt, s, epoch, i),
            )
        else:
            for i, batch in enumerate(train_iter):
                if cfg.profile_steps and epoch == 0 and i == 1:
                    jax.profiler.start_trace(f"{cfg.model_dir}/profile")
                state, m = train_step(
                    state, put(batch), pools, pool_sizes,
                    jax.random.fold_in(ekey, i)
                )
                latch = jnp.maximum(latch, m.pop("nonfinite", 0.0))
                if cfg.profile_steps and epoch == 0 and i == cfg.profile_steps:
                    jax.block_until_ready(m["loss"])
                    jax.profiler.stop_trace()
                    log.info(
                        f"profile trace written to {cfg.model_dir}/profile"
                    )
                timer.step(cfg.model.batch_size)
                if i % cfg.log_every == 0:
                    if float(latch) > 0.0:
                        state = _handle_nan(cfg, log, ckpt, state, epoch, i)
                        latch = jnp.zeros((), jnp.float32)
                        continue
                    meter.update(**{k: float(v) for k, v in m.items()})
                    log.info(
                        "train "
                        + ", ".join(
                            f"{k}:{meter.mean(k):.5f}" for k in sorted(m)
                        )
                    )
            if float(latch) > 0.0:
                state = _handle_nan(cfg, log, ckpt, state, epoch, "end")

        def _eval(params, key):
            if scanned_eval is not None:
                return evaluate_scanned(
                    scanned_eval, params, val_batches_dev, val_dom, val_ov,
                    vpools, vpool_sizes, key, cfg.overlap_eval, log=log,
                )
            return evaluate(
                eval_step, params, val_iter, vpools, vpool_sizes, key,
                cfg.overlap_eval, log=log, put=put,
            )

        ev = _eval(state.params, jax.random.fold_in(ekey, 10_000))
        _track_best(best, ev)
        log.info(
            f"epoch {epoch}/{cfg.epochs} val_loss={ev['val_loss']:.4f} "
            f"HR@10 d1={ev['hit_10_d1']:.4f} d2={ev['hit_10_d2']:.4f} "
            f"NDCG@10 d1={ev['ndcg_10_d1']:.4f} d2={ev['ndcg_10_d2']:.4f} "
            f"MRR d1={ev['mrr_d1']:.4f} d2={ev['mrr_d2']:.4f}"
        )
        if epoch_hook is not None:
            epoch_hook(epoch, state, ev, phase="main")

        if is_dr and dr_iter is not None:
            latch = jnp.zeros((), jnp.float32)
            if fast_train:

                def _on_dr_metrics(m0):
                    meter.update(loss_dr_r=float(m0["loss_dr_r"]))
                    log.info(
                        f"train loss_dr_r:{meter.mean('loss_dr_r'):.5f}"
                    )

                import jax.numpy as jnp_

                dperm_dev = resident_put(jnp_.asarray(dr_iter.epoch_perm()))
                state = _run_chunked(
                    dr_chunk_runner, state, dr_arrays_dev, dperm_dev,
                    len(dr_iter), dpools, dpool_sizes, ekey, 20_000,
                    cfg.log_every, None, cfg.model.batch_size,
                    _on_dr_metrics,
                    lambda s, i: _handle_nan(cfg, log, ckpt, s, epoch, i),
                )
            else:
                for i, batch in enumerate(dr_iter):
                    state, m = dr_step(
                        state, put(batch), dpools, dpool_sizes,
                        jax.random.fold_in(ekey, 20_000 + i),
                    )
                    latch = jnp.maximum(latch, m.pop("nonfinite", 0.0))
                    if i % cfg.log_every == 0:
                        if float(latch) > 0.0:
                            state = _handle_nan(
                                cfg, log, ckpt, state, epoch, i
                            )
                            latch = jnp.zeros((), jnp.float32)
                            continue
                        meter.update(loss_dr_r=float(m["loss_dr_r"]))
                        log.info(
                            f"train loss_dr_r:{meter.mean('loss_dr_r'):.5f}"
                        )
                if float(latch) > 0.0:
                    state = _handle_nan(cfg, log, ckpt, state, epoch, "end")
            ev = _eval(state.params, jax.random.fold_in(ekey, 30_000))
            _track_best(best, ev)
            log.info(
                f"epoch {epoch} (post-DR) HR@10 d1={ev['hit_10_d1']:.4f} "
                f"d2={ev['hit_10_d2']:.4f} MRR d1={ev['mrr_d1']:.4f} "
                f"d2={ev['mrr_d2']:.4f}"
            )
            if epoch_hook is not None:
                epoch_hook(epoch, state, ev, phase="post_dr")

        score = ev["mrr_d1"] + ev["mrr_d2"]
        if (
            ckpt is not None
            and score > best_score
            and (
                epoch - (ckpt.latest_step() if ckpt.latest_step() is not None
                         else -(10**9))
                >= cfg.checkpoint_every
                or epoch == cfg.epochs - 1
            )
        ):
            best_score = score
            ckpt.save(epoch, state)
        elif score > best_score:
            best_score = score

    best["examples_per_s"] = timer.examples_per_s
    best["start_epoch"] = float(start_epoch)
    if ckpt is not None:
        ckpt.close()
    return best


def aggregate_seeds(per_seed: list[dict[str, float]], log) -> dict[str, dict]:
    """5-seed mean/std block (train_sr.py:549-569)."""
    keys = sorted({k for d in per_seed for k in d})
    agg = {}
    for k in keys:
        vals = [d[k] for d in per_seed if k in d]
        agg[k] = {"mean": float(np.mean(vals)), "std": float(np.std(vals))}
        log.info(f"{k}: {agg[k]['mean']:.4f}/{agg[k]['std']:.4f}")
    return agg


def run(cfg: TrainConfig) -> dict[str, dict]:
    """Full multi-seed run (reference __main__, train_sr.py:357-626)."""
    log = init_logger(cfg.model_dir, "log_all.txt")
    log.info(cfg.to_json())
    is_dr = cfg.model.is_dr

    sub = cfg.subdomain if cfg.subdomain >= 0 else None
    train_ds = load_dual_domain_csv(
        cfg.data.train_csv(), cfg.model.seq_len, cfg.model.pad_id,
        cfg.data.long_length, subdomain=sub,
    )
    val_ds = load_dual_domain_csv(
        cfg.data.test_csv(), cfg.model.seq_len, cfg.model.pad_id,
        cfg.data.long_length, subdomain=sub,
    )
    dr_ds = (
        load_dual_domain_csv(
            cfg.data.train_dr_csv(), cfg.model.seq_len, cfg.model.pad_id,
            cfg.data.long_length, with_ob_label=True,
        )
        if is_dr
        else None
    )

    per_seed = []
    for seed in range(cfg.seed_offset, cfg.seed_offset + cfg.seeds):
        slog = init_logger(cfg.model_dir, f"log{seed}.txt")
        best = run_seed(cfg, seed, train_ds, val_ds, dr_ds, log=slog)
        per_seed.append(best)

    log = init_logger(cfg.model_dir, "log_all.txt")
    return aggregate_seeds(per_seed, log)
