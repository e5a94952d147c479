"""Data-layer protocol tests against the reference semantics
(dataset_seq.py:12-22, 177-250)."""

import numpy as np
import pytest

from amid_tpu.data.packed import pack_rows, seq_pad_trunc


def test_seq_pad_trunc_short():
    # len < seq_len: left-pad with pad_id (dataset_seq.py:20)
    assert seq_pad_trunc([5, 6], 5, 99) == [99, 99, 99, 5, 6]


def test_seq_pad_trunc_exact():
    assert seq_pad_trunc([1, 2, 3], 3, 99) == [1, 2, 3]


def test_seq_pad_trunc_long():
    # len >= seq_len+1: keep last seq_len items (dataset_seq.py:18)
    assert seq_pad_trunc([1, 2, 3, 4, 5], 3, 99) == [3, 4, 5]


@pytest.fixture
def packed():
    return pack_rows(
        user_ids=[10, 11, 12],
        seqs_d1=[[1, 2, 3, 2], [4, 5], []],
        seqs_d2=[[7, 8], [], [8, 9]],
        domain_ids=[0, 0, 1],
        ob_labels=None,
        seq_len=4,
        pad_id=99,
        long_length=3,
    )


def test_target_pop_and_dedupe(packed):
    # row 0: active d1 seq [1,2,3,2] -> target 2, history [1,3] (every other
    # occurrence of the target removed, dataset_seq.py:194-196)
    assert packed.target[0] == 2
    np.testing.assert_array_equal(packed.seq_d1[0], [99, 99, 1, 3])
    # the non-active domain sequence is untouched
    np.testing.assert_array_equal(packed.seq_d2[0], [99, 99, 7, 8])


def test_overlap_label(packed):
    # overlap = both raw seqs non-empty (dataset_seq.py:181-184);
    # rows 1 (empty d2) and 2 (empty d1) are non-overlapping users
    np.testing.assert_array_equal(packed.overlap, [1, 0, 0])


def test_domain2_target(packed):
    assert packed.target[2] == 9
    np.testing.assert_array_equal(packed.seq_d2[2], [99, 99, 99, 8])


def test_pools_exact(packed):
    # pools built from raw (pre-pop) sequences across the split
    # (dataset_seq.py:141-142,151-158): d1 {1,2,3,4,5}, d2 {7,8,9}
    assert packed.pool_sizes[0] == 5
    np.testing.assert_array_equal(
        np.sort(np.unique(packed.pools[0][: packed.pool_sizes[0]])), [1, 2, 3, 4, 5]
    )
    assert packed.pool_sizes[1] == 3
    np.testing.assert_array_equal(
        np.sort(np.unique(packed.pools[1][: packed.pool_sizes[1]])), [7, 8, 9]
    )


def test_reject_includes_target(packed):
    # negatives must avoid ALL of the user's active-domain items incl. target
    # (dataset_seq.py:188: pool subtraction happens before the pop).
    # reject stores *pool positions*: items {1,2,3} -> positions {0,1,2} in
    # the sorted d1 pool [1,2,3,4,5].
    n0 = packed.reject_counts[0]
    assert n0 == 3
    assert set(packed.reject[0][:n0].tolist()) == {0, 1, 2}
    # padding is the sentinel P
    assert (packed.reject[0][n0:] == packed.pools.shape[1]).all()


def test_long_tail_mask(packed):
    # long_length=3; row0 post-dedupe d1 len 2 -> 0, d2 len 2 -> 0
    assert packed.long_mask_d1[0] == 0
    # row2: d1 len 0 -> 0; d2 post-pop len 1 -> 0
    assert packed.long_mask_d2[2] == 0


def test_negative_sampler_exact(packed):
    """The skip-sorted-holes sampler is exact: never draws a rejected item,
    always draws from the right domain pool, and covers the full valid set —
    even for pathological pools where most items are rejected."""
    import jax
    import jax.numpy as jnp

    from amid_tpu.data.sampler import sample_negatives

    key = jax.random.PRNGKey(0)
    neg = sample_negatives(
        key,
        jnp.asarray(packed.pools),
        jnp.asarray(packed.pool_sizes),
        jnp.asarray(packed.domain_id),
        jnp.asarray(packed.reject),
        num_neg=256,
        reject_counts=jnp.asarray(packed.reject_counts),
    )
    neg = np.asarray(neg)
    assert neg.shape == (3, 256)
    for i in range(3):
        d = packed.domain_id[i]
        pool = packed.pools[d][: packed.pool_sizes[d]]
        nrej = packed.reject_counts[i]
        rej_items = set(pool[packed.reject[i][:nrej]].tolist())
        valid = set(pool.tolist()) - rej_items
        drawn = set(neg[i].tolist())
        assert drawn <= valid, f"row {i}: drew outside valid set"
        # 256 draws from tiny valid sets must cover them entirely
        assert drawn == valid, f"row {i}: {valid - drawn} never drawn"


def test_negative_sampler_uniform(packed):
    """Draw frequencies over the valid set are uniform within tolerance."""
    import jax
    import jax.numpy as jnp

    from amid_tpu.data.sampler import sample_negatives

    neg = sample_negatives(
        jax.random.PRNGKey(7),
        jnp.asarray(packed.pools),
        jnp.asarray(packed.pool_sizes),
        jnp.asarray(packed.domain_id),
        jnp.asarray(packed.reject),
        num_neg=4000,
        reject_counts=jnp.asarray(packed.reject_counts),
    )
    row = np.asarray(neg)[0]  # valid set {4, 5}
    frac = (row == 4).mean()
    assert 0.45 < frac < 0.55


def test_packed_save_load_roundtrip(tmp_path, packed):
    p = str(tmp_path / "ds.npz")
    packed.save(p)
    from amid_tpu.data.packed import PackedDualDomainDataset

    loaded = PackedDualDomainDataset.load(p)
    assert loaded.pad_id == packed.pad_id and loaded.seq_len == packed.seq_len
    for k, v in packed.batch_arrays().items():
        np.testing.assert_array_equal(loaded.batch_arrays()[k], v)
    np.testing.assert_array_equal(loaded.pools, packed.pools)


def test_native_pack_matches_python_pack(tmp_path):
    """amid_pack (native/csv_parser.cpp) must reproduce pack_rows
    bit-for-bit — including DR ob_label, pools, and reject positions."""
    import csv as _csv

    from amid_tpu.data.native import pack_csv_native
    from amid_tpu.data.packed import pack_rows

    rows = [
        (0, [3, 1, 3, 2, 3], [], 0, 1),      # dup targets to dedupe
        (1, [], [10, 11, 10], 1, 0),
        (2, [5, 2], [12, 10, 13, 14], 1, 1),
        (3, [1, 2, 3, 4, 5, 6, 7, 8], [11], 0, 0),  # longer than seq_len
    ]
    p = tmp_path / "t.csv"
    with open(p, "w", newline="") as f:
        w = _csv.writer(f, quoting=_csv.QUOTE_NONNUMERIC)
        w.writerow(["user_id", "seq_d1", "seq_d2", "domain_id", "ob_label"])
        for u, s1, s2, d, ob in rows:
            w.writerow([u, str(s1), str(s2), d, ob])

    nat = pack_csv_native(str(p), True, 6, 99, 3)
    if nat is None:
        import pytest

        pytest.skip("native lib unavailable")
    py = pack_rows(
        [r[0] for r in rows], [r[1] for r in rows], [r[2] for r in rows],
        [r[3] for r in rows], [r[4] for r in rows], 6, 99, 3,
    )
    for k, v in py.batch_arrays().items():
        assert (nat.batch_arrays()[k] == v).all(), k
    assert (nat.pools == py.pools).all()
    assert (nat.pool_sizes == py.pool_sizes).all()
