"""Metric math vs. hand-computed examples (SURVEY.md §4 unit tier)."""

import jax.numpy as jnp
import numpy as np

from seqrec_tpu.eval.metrics import (
    finalize_metrics,
    mask_scores,
    rank_metrics,
    ranks_from_scores,
)


def test_ranks_from_scores_basic():
    scores = jnp.array(
        [
            [1.0, 5.0, 3.0, 2.0],  # target col 2 (3.0): one score higher -> rank 1
            [9.0, 1.0, 2.0, 3.0],  # target col 0 (9.0): rank 0
            [0.0, 0.0, 0.0, 4.0],  # target col 1 (0.0): only 4.0 greater -> rank 1
        ]
    )
    tgt = jnp.array([2, 0, 1])
    ranks = ranks_from_scores(scores, tgt)
    np.testing.assert_array_equal(np.asarray(ranks), [1, 0, 1])


def test_nan_target_ranks_last():
    scores = jnp.array([[jnp.nan, 1.0, 2.0], [3.0, 1.0, 2.0]])
    ranks = ranks_from_scores(scores, jnp.array([0, 0]))
    np.testing.assert_array_equal(np.asarray(ranks), [3, 0])


def test_ranks_ties_are_optimistic():
    # Ties: strictly-greater convention means equal scores don't worsen rank.
    scores = jnp.array([[2.0, 2.0, 2.0]])
    assert int(ranks_from_scores(scores, jnp.array([1]))[0]) == 0


def test_rank_metrics_hand_computed():
    ranks = jnp.array([0, 4, 10, 1])
    valid = jnp.array([1.0, 1.0, 1.0, 0.0])  # last row is padding
    out = rank_metrics(ranks, valid, ks=(5, 10))
    # ranks 0 and 4 are < 5; rank 10 misses both cutoffs.
    assert float(out["recall@5"]) == 2.0
    assert float(out["recall@10"]) == 2.0
    np.testing.assert_allclose(float(out["mrr@5"]), 1.0 + 1.0 / 5.0, rtol=1e-5)
    np.testing.assert_allclose(
        float(out["ndcg@5"]), 1.0 / np.log2(2.0) + 1.0 / np.log2(6.0), rtol=1e-4
    )
    assert float(out["count"]) == 3.0


def test_finalize_divides_by_count():
    sums = {"recall@5": jnp.asarray(2.0), "count": jnp.asarray(4.0)}
    out = finalize_metrics(sums)
    assert out["recall@5"] == 0.5
    assert out["count"] == 4.0


def test_mask_scores_pad_and_history():
    scores = jnp.ones((2, 5))
    exclude = jnp.array([[1, 2, 0], [3, 0, 0]])
    masked = mask_scores(scores, exclude=exclude)
    m = np.asarray(masked)
    assert (m[:, 0] < -1e29).all()  # pad column
    assert m[0, 1] < -1e29 and m[0, 2] < -1e29
    assert m[1, 3] < -1e29
    assert m[0, 3] == 1.0 and m[1, 1] == 1.0  # untouched
