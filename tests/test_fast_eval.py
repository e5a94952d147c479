"""Fast-eval parity: the one-program lax.scan eval (cfg.fast_eval,
steps.make_scanned_eval) must reproduce the per-batch loop path
(train.loop.evaluate) EXACTLY — same fold_in(key, i) negative draws, same
rank/bucket accumulation — across a full run_seed, base and DR schedules.
Reference protocol being reproduced: test() train_sr.py:31-128 /
train_sr_dr.py:31-128 with the drop_last=True val loader
(train_sr.py:454-455)."""

import numpy as np
import pytest

from amid_tpu.train.loop import run_seed
from test_train_smoke import _cfg, synth_dataset


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(11)
    return (
        synth_dataset(rng, n_rows=64),
        synth_dataset(rng, n_rows=40),  # 5 val batches at bs 8
        synth_dataset(rng, n_rows=48),
    )


def _metric_keys(d):
    return [k for k in d if k.startswith(("hit_", "ndcg_", "mrr", "val_"))]


def test_fast_eval_matches_loop_base(tmp_path, data):
    train, val, _ = data
    cfg_fast = _cfg(tmp_path / "f")
    cfg_fast.epochs = 2
    cfg_slow = _cfg(tmp_path / "s")
    cfg_slow.epochs = 2
    cfg_slow.fast_eval = False
    fast = run_seed(cfg_fast, seed=0, train_ds=train, val_ds=val)
    slow = run_seed(cfg_slow, seed=0, train_ds=train, val_ds=val)
    for k in _metric_keys(slow):
        assert fast[k] == pytest.approx(slow[k], abs=1e-6), k


def test_fast_eval_matches_loop_dr(tmp_path, data):
    train, val, dr = data
    kw = dict(is_dr=True, is_itc=True, ts2=0.4)
    cfg_fast = _cfg(tmp_path / "f", **kw)
    cfg_slow = _cfg(tmp_path / "s", **kw)
    cfg_slow.fast_eval = False
    fast = run_seed(cfg_fast, seed=0, train_ds=train, val_ds=val, dr_ds=dr)
    slow = run_seed(cfg_slow, seed=0, train_ds=train, val_ds=val, dr_ds=dr)
    for k in _metric_keys(slow):
        assert fast[k] == pytest.approx(slow[k], abs=1e-6), k


def test_fast_eval_respects_overlap_buckets(tmp_path, data):
    train, val, _ = data
    cfg_fast = _cfg(tmp_path / "f")
    cfg_fast.overlap_eval = True
    cfg_slow = _cfg(tmp_path / "s")
    cfg_slow.overlap_eval = True
    cfg_slow.fast_eval = False
    fast = run_seed(cfg_fast, seed=0, train_ds=train, val_ds=val)
    slow = run_seed(cfg_slow, seed=0, train_ds=train, val_ds=val)
    bucketed = [k for k in slow if k.endswith(("_ov", "_no"))]
    assert bucketed, "overlap buckets missing from loop-path metrics"
    for k in bucketed:
        assert fast[k] == pytest.approx(slow[k], abs=1e-6), k
