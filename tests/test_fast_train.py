"""Fast-train parity: the chunked-scan epoch driver (cfg.fast_train,
steps.make_resident_chunk_runner + loop._run_chunked) must reproduce per-step
dispatch EXACTLY — same batch order (BatchIterator.stacked draws the same
permutation __iter__ would), same fold_in(ekey, i) keys per global step
index, same log-cadence metric sampling — across full run_seed, base and
DR schedules. Reference hot loop being reproduced: train_sr.py:190-219 /
train_sr_dr.py:191-229,363-403."""

import numpy as np
import pytest

from amid_tpu.data.loader import BatchIterator
from amid_tpu.train.loop import run_seed
from test_train_smoke import _cfg, synth_dataset


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(23)
    return (
        synth_dataset(rng, n_rows=72),  # 9 train batches at bs 8
        synth_dataset(rng, n_rows=40),
        synth_dataset(rng, n_rows=56),  # 7 DR batches
    )


def _metric_keys(d):
    return [k for k in d if k.startswith(("hit_", "ndcg_", "mrr", "val_"))]


def test_stacked_matches_iter_stream(data):
    """stacked() must consume the iterator rng identically to __iter__ —
    an epoch of one must equal the same epoch of the other."""
    train, _, _ = data
    it_a = BatchIterator(train, 8, shuffle=True, seed=5)
    it_b = BatchIterator(train, 8, shuffle=True, seed=5)
    for _ in range(3):  # epochs advance both rngs in lockstep
        loops = list(it_a)
        stck = it_b.stacked()
        assert len(loops) == next(iter(stck.values())).shape[0]
        for bi, b in enumerate(loops):
            for k, v in b.items():
                np.testing.assert_array_equal(v, stck[k][bi])


@pytest.mark.parametrize("log_every", [2, 4])
def test_fast_train_matches_loop_base(tmp_path, data, log_every):
    """log_every 2 divides the 9 batches unevenly (tail chunk of 1) and 4
    leaves a tail of 1 — both the even and ragged chunk paths must match."""
    train, val, _ = data
    cfg_fast = _cfg(tmp_path / f"f{log_every}")
    cfg_fast.epochs = 2
    cfg_fast.log_every = log_every
    cfg_slow = _cfg(tmp_path / f"s{log_every}")
    cfg_slow.epochs = 2
    cfg_slow.log_every = log_every
    cfg_slow.fast_train = False
    fast = run_seed(cfg_fast, seed=0, train_ds=train, val_ds=val)
    slow = run_seed(cfg_slow, seed=0, train_ds=train, val_ds=val)
    for k in _metric_keys(slow):
        assert fast[k] == pytest.approx(slow[k], abs=1e-6), k


def test_fast_train_matches_loop_dr(tmp_path, data):
    train, val, dr = data
    kw = dict(is_dr=True, is_itc=True, ts2=0.4)
    cfg_fast = _cfg(tmp_path / "f", **kw)
    cfg_slow = _cfg(tmp_path / "s", **kw)
    cfg_slow.fast_train = False
    fast = run_seed(cfg_fast, seed=0, train_ds=train, val_ds=val, dr_ds=dr)
    slow = run_seed(cfg_slow, seed=0, train_ds=train, val_ds=val, dr_ds=dr)
    for k in _metric_keys(slow):
        assert fast[k] == pytest.approx(slow[k], abs=1e-6), k


def test_fast_train_matches_loop_c2dsr(tmp_path, data):
    """The C2DSR contrastive step (corrupted views sampled inside the jit
    step) must scan identically too — results/c2dsr_full was produced on
    this path."""
    train, val, _ = data
    kw = dict(is_c2dsr=True)
    cfg_fast = _cfg(tmp_path / "f", **kw)
    cfg_slow = _cfg(tmp_path / "s", **kw)
    cfg_slow.fast_train = False
    fast = run_seed(cfg_fast, seed=0, train_ds=train, val_ds=val)
    slow = run_seed(cfg_slow, seed=0, train_ds=train, val_ds=val)
    for k in _metric_keys(slow):
        assert fast[k] == pytest.approx(slow[k], abs=1e-6), k


def test_fast_train_matches_loop_lazy(tmp_path, data):
    """The lazy-Adam steps must scan too (bench.py already scans them; this
    pins the trainer wiring end to end)."""
    train, val, _ = data
    cfg_fast = _cfg(tmp_path / "f")
    cfg_fast.lazy_table_adam = True
    cfg_slow = _cfg(tmp_path / "s")
    cfg_slow.lazy_table_adam = True
    cfg_slow.fast_train = False
    fast = run_seed(cfg_fast, seed=0, train_ds=train, val_ds=val)
    slow = run_seed(cfg_slow, seed=0, train_ds=train, val_ds=val)
    for k in _metric_keys(slow):
        assert fast[k] == pytest.approx(slow[k], abs=1e-6), k
