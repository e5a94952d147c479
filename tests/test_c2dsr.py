"""C2DSR mode: corrupted-view semantics vs the ACTUAL reference dataset
(dataset_seq.py:276-441), infomax-loss numerics vs a numpy oracle, and an
e2e trainer smoke."""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_dataset_seq():
    sys.path.insert(0, REF)
    import random as _random

    # py3.12 removed random.sample(set) — same shim as tools/run_reference_cpu
    orig = _random.sample

    def compat(population, k, **kw):
        if isinstance(population, (set, frozenset, dict)):
            population = tuple(population)
        return orig(population, k, **kw)

    _random.sample = compat
    import dataset_seq

    yield dataset_seq
    _random.sample = orig
    sys.path.remove(REF)


def test_interleave_matches_reference_generate_corr_seq(ref_dataset_seq, rng):
    from amid_tpu.data.sampler import interleave_corr_seq

    real = rng.integers(0, 100, (4, 6)).astype(np.int32)
    fake = rng.integers(100, 200, (4, 6)).astype(np.int32)
    got = np.asarray(interleave_corr_seq(jnp.asarray(real), jnp.asarray(fake)))
    for b in range(4):
        want = ref_dataset_seq.generate_corr_seq(
            real[b].tolist(), fake[b].tolist()
        )
        np.testing.assert_array_equal(got[b], want)


def test_reference_c2dsr_dataset_semantics(ref_dataset_seq, tmp_path):
    """Drive the actual DualDomainSeqDatasetC2DSR on a tiny CSV and check the
    properties our device-side view builder reproduces: corr items come from
    the active domain pool minus the user's items; corr_seq_dX is the
    elementwise interleave of the padded seq with corr; all_seq interleaves
    the two padded seqs."""
    csv = tmp_path / "tiny.csv"
    rows = [
        (0, [1, 2, 3], [11, 12], 0),
        (1, [4, 5], [13, 14, 15], 1),
        (2, [2, 6, 7, 8], [16], 0),
        (3, [9], [12, 17, 18], 1),
    ]
    with open(csv, "w") as f:
        f.write("user_id,seq_d1,seq_d2,domain_id\n")
        for u, s1, s2, d in rows:
            f.write(f'{u},"{s1}","{s2}",{d}\n')

    seq_len = 5
    ds = ref_dataset_seq.DualDomainSeqDatasetC2DSR(
        seq_len=seq_len, isTrain=True, neg_nums=1, long_length=2,
        pad_id=999, csv_path=str(csv),
    )
    pools = {0: {1, 2, 3, 4, 5, 6, 7, 8, 9}, 1: {11, 12, 13, 14, 15, 16, 17, 18}}
    for idx, (u, s1, s2, d) in enumerate(rows):
        s = ds[idx]
        own = set(s1) if d == 0 else set(s2)
        seq_d1 = s["seq_d1"][0].tolist()
        seq_d2 = s["seq_d2"][0].tolist()
        corr_d1 = s["corr_seq_d1"][0].tolist()
        corr_d2 = s["corr_seq_d2"][0].tolist()
        all_seq = s["all_seq"][0].tolist()
        # reconstruct corr from the interleave: odd positions of corr_seq_d1
        corr = corr_d1[1::2]
        assert len(corr) == seq_len
        assert corr_d1[0::2] == seq_d1
        assert corr_d2[0::2] == seq_d2
        assert corr_d2[1::2] == corr
        assert all_seq[0::2] == seq_d1 and all_seq[1::2] == seq_d2
        # corr drawn from active pool minus the user's (full) item set
        assert set(corr) <= pools[d] - own

    # our device-side equivalent obeys the same membership rule
    from amid_tpu.train.c2dsr import c2dsr_views, sample_corr

    batch = {
        "seq_d1": jnp.asarray([[999, 999, 1, 2, 3]], jnp.int32),
        "seq_d2": jnp.asarray([[999, 999, 999, 11, 12]], jnp.int32),
        "domain_id": jnp.asarray([0], jnp.int32),
        # sorted pool [1..9]; user holes at positions of {1,2,3} -> 0,1,2
        "reject": jnp.asarray([[0, 1, 2]], jnp.int32),
        "reject_counts": jnp.asarray([3], jnp.int32),
    }
    pools_arr = jnp.asarray(
        [[1, 2, 3, 4, 5, 6, 7, 8, 9], [11, 12, 13, 14, 15, 16, 17, 18, 0]],
        jnp.int32,
    )
    pool_sizes = jnp.asarray([9, 8], jnp.int32)
    corr = np.asarray(
        sample_corr(jax.random.PRNGKey(0), pools_arr, pool_sizes, batch)
    )
    assert corr.shape == (1, 5)
    assert set(corr[0].tolist()) <= {4, 5, 6, 7, 8, 9}
    views = c2dsr_views(batch, jnp.asarray(corr))
    got = np.asarray(views["corr_seq_d1"][0])
    assert got[0::2].tolist() == [999, 999, 1, 2, 3]
    assert got[1::2].tolist() == corr[0].tolist()


def test_infomax_loss_numpy_oracle(rng):
    from amid_tpu.train.c2dsr import infomax_loss

    h = [rng.normal(size=(8, 16)).astype(np.float32) for _ in range(6)]
    got = float(infomax_loss(*[jnp.asarray(x) for x in h]))
    h1, h2, ha1, ha2, hc1, hc2 = h

    def softplus(x):
        return np.logaddexp(0.0, x)

    want = np.mean(
        softplus(-np.sum(ha1 * h1, -1)) + softplus(-np.sum(ha2 * h2, -1))
        + softplus(np.sum(hc1 * h1, -1)) + softplus(np.sum(hc2 * h2, -1))
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_c2dsr_training_smoke(tmp_path, rng):
    from amid_tpu.train.loop import run_seed
    from test_train_smoke import _cfg, synth_dataset

    train = synth_dataset(rng, n_rows=64)
    val = synth_dataset(rng, n_rows=32)
    cfg = _cfg(tmp_path, is_c2dsr=True)
    cfg.epochs = 1
    best = run_seed(cfg, seed=0, train_ds=train, val_ds=val)
    assert np.isfinite(best["examples_per_s"])
    assert 0.0 <= best["hit_10_d1"] <= 1.0


def test_c2dsr_rejects_lazy(tmp_path, rng):
    from amid_tpu.train.loop import run_seed
    from test_train_smoke import _cfg, synth_dataset

    train = synth_dataset(rng, n_rows=64)
    val = synth_dataset(rng, n_rows=32)
    cfg = _cfg(tmp_path, is_c2dsr=True)
    cfg.lazy_table_adam = True
    with pytest.raises(ValueError, match="isC2DSR"):
        run_seed(cfg, seed=0, train_ds=train, val_ds=val)
