"""Worker for the 2-process TRAINER test (test_distributed.py): joins a
2-process gloo CPU runtime and runs run_seed — the real trainer, full DR
schedule — over the global mesh. Each process holds an identical host copy
of the synthetic datasets (seed-deterministic, same construction as
test_mesh_trainer's fixture) and parallel.distributed.put_global hands its
addressable shards their slices; process 0 prints the best-metric dict for
the parent to compare against the single-process GSPMD run at the same
logical mesh (VERDICT r4 #1 — the last untested multi-host seam).

Run: DIST_TRAINER_DIR=<shared_model_dir> python distributed_trainer_worker.py \
       <pid> <port> <data_axis> <model_axis> <schedule>
Schedules: "dr" = full DR + fast scanned loops + bf16_moments checkpoint
save/resume on the shared dir; "base" = per-step loops (fast_train/eval
off) so the latch math and per-batch eval are multi-process-proven too.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # 1 local CPU device per process

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)

from amid_tpu.parallel.distributed import initialize_distributed  # noqa: E402


def main() -> None:
    pid, port = int(sys.argv[1]), sys.argv[2]
    data_axis, model_axis = int(sys.argv[3]), int(sys.argv[4])
    schedule = sys.argv[5]
    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()

    import numpy as np
    from amid_tpu.config import MeshConfig
    from amid_tpu.train.loop import run_seed
    from test_train_smoke import _cfg, synth_dataset

    rng = np.random.default_rng(7)  # == test_mesh_trainer's `data` fixture
    train = synth_dataset(rng, n_rows=64)
    val = synth_dataset(rng, n_rows=32)
    dr = synth_dataset(rng, n_rows=48)

    # shared model_dir across processes (the real-slice layout): process 0
    # owns the log files (utils/logging.py) and orbax coordinates the save
    tmp = os.environ["DIST_TRAINER_DIR"]
    is_dr = schedule == "dr"
    kw = dict(is_dr=True, is_itc=True, ts2=0.4) if is_dr else {}
    cfg = _cfg(tmp, **kw)
    cfg.epochs = 1
    cfg.use_mesh = True
    cfg.mesh_impl = "gspmd"
    cfg.mesh = MeshConfig(data_axis=data_axis, model_axis=model_axis)
    if is_dr:
        # exercise the multi-process orbax save (epoch-end checkpoint),
        # including the bf16_moments eager casts on global arrays
        cfg.checkpoint = True
        cfg.checkpoint_every = 0
        cfg.checkpoint_payload = "bf16_moments"
    else:
        # the base-schedule worker covers the PER-STEP loops (train latch
        # math + per-batch eval) under multi-process; the DR worker covers
        # the default scanned fast paths
        cfg.fast_train = False
        cfg.fast_eval = False
    best = run_seed(
        cfg, seed=0, train_ds=train, val_ds=val, dr_ds=dr if is_dr else None
    )
    if is_dr:
        # ... and the multi-process restore: resume skips the trained epoch
        cfg.resume = True
        resumed = run_seed(
            cfg, seed=0, train_ds=train, val_ds=val, dr_ds=dr
        )
        assert resumed["start_epoch"] == 1.0, resumed["start_epoch"]
    if pid == 0:
        print("METRICS " + json.dumps(best), flush=True)
    print(f"TRAINER_OK p{pid}", flush=True)


if __name__ == "__main__":
    main()
