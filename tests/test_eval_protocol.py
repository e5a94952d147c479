"""End-to-end eval-protocol oracle: the on-device eval + RankAccumulator
pipeline must reproduce a direct numpy transcription of the reference's
test() routine (train_sr.py:31-128: choose_predict/choose_predict_overlap
routing, tie-break, double-argsort ranks, get_sample_scores)."""

import numpy as np
import jax.numpy as jnp

from amid_tpu.train.metrics import (
    FIX_VALUE,
    RankAccumulator,
    positive_ranks,
)


def numpy_reference_eval(pred_d1, pred_d2, dom, overlap):
    """Direct transcription of the reference protocol on host numpy."""
    def get_sample_scores(pred_list):
        ranks = (-pred_list).argsort(kind="stable").argsort(kind="stable")[:, 0]
        out = {}
        for k in (1, 5, 10):
            hit = ranks < k
            out[f"hit_{k}"] = hit.mean()
            out[f"ndcg_{k}"] = (hit / np.log2(ranks + 2.0)).mean()
        out["mrr"] = (1.0 / (ranks + 1.0)).mean()
        return out

    metrics = {}
    for d, tag in ((0, "d1"), (1, "d2")):
        pred = pred_d1 if d == 0 else pred_d2
        rows = pred[dom == d].copy()
        rows[:, 0] -= FIX_VALUE  # full-domain tie-break (train_sr.py:114)
        for k, v in get_sample_scores(rows).items():
            metrics[f"{k}_{tag}"] = v
        for o, otag in ((1, "ov"), (0, "no")):
            rows = pred[(dom == d) & (overlap == o)]  # no tie-break
            if len(rows):
                for k, v in get_sample_scores(rows).items():
                    metrics[f"{k}_{tag}_{otag}"] = v
    return metrics


def test_eval_pipeline_matches_numpy_reference(rng):
    n, negs = 128, 19
    pred_d1 = rng.uniform(size=(n, 1 + negs)).astype(np.float32)
    pred_d2 = rng.uniform(size=(n, 1 + negs)).astype(np.float32)
    dom = rng.integers(0, 2, n).astype(np.int32)
    overlap = rng.integers(0, 2, n).astype(np.int32)

    # device pipeline, fed in two batches like the eval loop
    acc = RankAccumulator(overlap_eval=True)
    for sl in (slice(0, 64), slice(64, 128)):
        pred = np.where(dom[sl, None] == 0, pred_d1[sl], pred_d2[sl])
        acc.add(
            np.asarray(positive_ranks(jnp.asarray(pred), fix=True)),
            np.asarray(positive_ranks(jnp.asarray(pred), fix=False)),
            dom[sl], overlap[sl],
        )
    got = acc.finalize()
    want = numpy_reference_eval(pred_d1, pred_d2, dom, overlap)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, f"{k}: {got[k]} vs {v}"
