"""BatchIterator semantics: drop_last, per-epoch reshuffle, determinism."""

import numpy as np

from amid_tpu.data.loader import BatchIterator
from amid_tpu.data.packed import pack_rows


def _ds(n=10):
    return pack_rows(
        user_ids=list(range(n)),
        seqs_d1=[[1, 2, 3]] * n,
        seqs_d2=[[4, 5]] * n,
        domain_ids=[0] * n,
        ob_labels=None,
        seq_len=4,
        pad_id=99,
    )


def test_drop_last():
    it = BatchIterator(_ds(10), batch_size=4, shuffle=False, drop_last=True)
    assert len(it) == 2
    batches = list(it)
    assert all(b["user"].shape[0] == 4 for b in batches)

    it2 = BatchIterator(_ds(10), batch_size=4, shuffle=False, drop_last=False)
    assert len(it2) == 3
    assert list(it2)[-1]["user"].shape[0] == 2


def test_shuffle_changes_per_epoch_and_is_seeded():
    it = BatchIterator(_ds(64), batch_size=8, shuffle=True, seed=3)
    e1 = np.concatenate([b["user"] for b in it])
    e2 = np.concatenate([b["user"] for b in it])
    assert not np.array_equal(e1, e2)  # reshuffled across epochs
    # same seed -> same epoch-1 order
    it_b = BatchIterator(_ds(64), batch_size=8, shuffle=True, seed=3)
    np.testing.assert_array_equal(e1, np.concatenate([b["user"] for b in it_b]))
    # every row visited exactly once per epoch
    np.testing.assert_array_equal(np.sort(e1), np.arange(64))


def test_sequential_order_when_unshuffled():
    it = BatchIterator(_ds(12), batch_size=4, shuffle=False)
    users = np.concatenate([b["user"] for b in it])
    np.testing.assert_array_equal(users, np.arange(12))
