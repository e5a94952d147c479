"""End-to-end smoke: tiny synthetic dataset through the full train/eval loop
(base and DR), on CPU. Verifies the whole stack wires together and losses are
finite/decreasing-ish."""

import numpy as np
import pytest

from amid_tpu.config import DataConfig, ModelConfig, TrainConfig
from amid_tpu.data.packed import pack_rows
from amid_tpu.train.loop import run_seed


def synth_dataset(rng, n_rows=64, n_items=40, seq_len=6):
    users, s1, s2, dom = [], [], [], []
    for i in range(n_rows):
        users.append(i)
        l1 = int(rng.integers(0, 5))
        l2 = int(rng.integers(0, 5))
        d = int(rng.integers(0, 2))
        # active domain needs >= 2 items (target + at least one history item)
        if d == 0:
            l1 = max(l1, 2)
        else:
            l2 = max(l2, 2)
        s1.append(rng.integers(1, n_items, l1).tolist())
        s2.append(rng.integers(n_items, 2 * n_items, l2).tolist())
        dom.append(d)
    ob = rng.integers(0, 2, n_rows).tolist()
    return pack_rows(users, s1, s2, dom, ob, seq_len, pad_id=2 * n_items + 1)


@pytest.fixture
def tiny_data(rng):
    train = synth_dataset(rng, n_rows=64)
    val = synth_dataset(rng, n_rows=32)
    return train, val


def test_base_training_runs(tmp_path, tiny_data):
    train, val = tiny_data
    cfg = _cfg(tmp_path)
    best = run_seed(cfg, seed=0, train_ds=train, val_ds=val)
    assert np.isfinite(best["examples_per_s"])
    assert 0.0 <= best["hit_10_d1"] <= 1.0
    assert "mrr_d2" in best


def test_dr_training_runs(tmp_path, tiny_data, rng):
    train, val = tiny_data
    dr = synth_dataset(rng, n_rows=48)
    cfg = _cfg(tmp_path, is_dr=True, is_itc=True, ts2=0.4)
    best = run_seed(cfg, seed=0, train_ds=train, val_ds=val, dr_ds=dr)
    assert "mrr_d1" in best


def _cfg(tmp_path, **model_kw):
    model = ModelConfig(
        backbone="sasrec", emb_dim=16, hid_dim=8, seq_len=6, batch_size=8,
        item_length=90, user_length=90, sasrec_heads=2, bert_heads=2,
        bert_ff_dim=32, kernels="xla", **model_kw,
    )
    return TrainConfig(
        epochs=2, lr=1e-3, seeds=1,
        model_dir=str(tmp_path), checkpoint=False,
        model=model, data=DataConfig(neg_nums=5),
    )


def test_seed_offset_runs_requested_seeds(tmp_path, rng, monkeypatch):
    """--seed_offset extends a committed 3-seed table: run() must train
    exactly seeds [offset, offset+seeds) and name logs by absolute seed."""
    import amid_tpu.train.loop as loop_mod

    train, val = synth_dataset(rng, n_rows=64), synth_dataset(rng, n_rows=32)
    # run() loads train then val CSVs; return the synthetic packs in order.
    calls = []
    def fake_load(*a, **kw):
        calls.append(a)
        return train if len(calls) == 1 else val
    monkeypatch.setattr(loop_mod, "load_dual_domain_csv", fake_load)

    cfg = _cfg(tmp_path)
    cfg.epochs = 1
    cfg.seeds = 1
    cfg.seed_offset = 3
    agg = loop_mod.run(cfg)
    assert (tmp_path / "log3.txt").exists()
    assert not (tmp_path / "log0.txt").exists()
    assert "mrr_d1" in agg
