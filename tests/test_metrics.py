"""Ranking metrics vs the reference's double-argsort formulation
(utils.py:296-313, train_sr.py:114-115)."""

import numpy as np
import jax.numpy as jnp

from amid_tpu.train.metrics import FIX_VALUE, positive_ranks, rank_metrics


def reference_ranks(pred, fix=True):
    pred = pred.copy()
    if fix:
        pred[:, 0] = pred[:, 0] - FIX_VALUE
    return (-pred).argsort(kind="stable").argsort(kind="stable")[:, 0]


def reference_metric(ranks, topk):
    ndcg = hit = mrr = 0.0
    for rank in ranks:
        mrr += 1.0 / (rank + 1.0)
        if rank < topk:
            ndcg += 1.0 / np.log2(rank + 2.0)
            hit += 1.0
    n = len(ranks)
    return hit / n, ndcg / n, mrr / n


def test_positive_ranks_match_double_argsort(rng):
    pred = rng.uniform(size=(64, 12)).astype(np.float32)
    got = np.asarray(positive_ranks(jnp.asarray(pred), fix=True))
    want = reference_ranks(pred, fix=True)
    np.testing.assert_array_equal(got, want)


def test_positive_ranks_ties():
    # positive tied with a negative: the 1e-7 tie-break demotes the positive
    pred = np.array([[0.5, 0.5, 0.1], [0.9, 0.2, 0.2]], np.float32)
    got_fix = np.asarray(positive_ranks(jnp.asarray(pred), fix=True))
    np.testing.assert_array_equal(got_fix, reference_ranks(pred, fix=True))
    got_raw = np.asarray(positive_ranks(jnp.asarray(pred), fix=False))
    np.testing.assert_array_equal(got_raw, reference_ranks(pred, fix=False))


def test_rank_metrics_match_reference(rng):
    ranks = rng.integers(0, 30, size=100)
    m = rank_metrics(ranks)
    for k in (1, 5, 10):
        hit, ndcg, mrr = reference_metric(ranks, k)
        assert abs(m[f"hit_{k}"] - hit) < 1e-12
        assert abs(m[f"ndcg_{k}"] - ndcg) < 1e-12
        assert abs(m["mrr"] - mrr) < 1e-12
