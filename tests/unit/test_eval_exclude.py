"""eval.exclude_history (SURVEY.md §2 #22 protocol knob; VERDICT r2 missing
#5): a user's own history must not outrank the held-out target, identically
on the dense, chunked, and sharded full-eval paths. Plus the vectorized
batch candidate sampler vs. the per-row reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqrec_tpu.eval.chunked import chunked_ranks
from seqrec_tpu.eval.harness import (
    sample_eval_candidates,
    sample_eval_candidates_batch,
)
from seqrec_tpu.eval.metrics import (
    first_occurrence_2d,
    mask_scores,
    ranks_from_scores,
)


def _setup(B=6, T=9, V=40, D=8, seed=0, num_valid=None):
    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(V,)), jnp.float32)
    targets = jnp.asarray(rng.integers(1, num_valid or V, size=(B,)), jnp.int32)
    # Histories with pad zeros AND deliberate duplicates.
    excl = rng.integers(0, num_valid or V, size=(B, T))
    excl[:, -2] = excl[:, 0]  # duplicate
    excl[:, -1] = 0  # pad
    excl = jnp.asarray(excl, jnp.int32)
    return table, h, bias, targets, excl


def _dense_oracle(table, h, bias, targets, excl, num_valid):
    scores = (h @ table.T + bias[None, :]).astype(jnp.float32)
    if num_valid is not None:
        cols = jnp.arange(table.shape[0])
        scores = jnp.where(cols[None, :] < num_valid, scores, -1e30)
    # Protocol: seen items are excluded EXCEPT the held-out target itself (a
    # repeat-interaction target must stay rankable) — same preprocessing as
    # the harness's dense step.
    excl = jnp.where(excl == targets[:, None], 0, excl)
    scores = mask_scores(scores, exclude=excl)
    return ranks_from_scores(scores, targets)


@pytest.mark.parametrize("chunk", [7, 16, 40])
@pytest.mark.parametrize("num_valid", [None, 37])
def test_chunked_exclude_matches_dense_mask(chunk, num_valid):
    table, h, bias, targets, excl = _setup(num_valid=num_valid)
    want = _dense_oracle(table, h, bias, targets, excl, num_valid)
    got = chunked_ranks(
        table, h, targets, bias=bias, num_valid=num_valid,
        compute_dtype=jnp.float32, chunk=chunk, exclude=excl,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_chunked_exclude_target_in_history_is_ignored():
    """A target that appears in its own history must still be rankable."""
    table, h, bias, targets, excl = _setup()
    excl = excl.at[:, 1].set(targets)  # history contains the target
    want_noexcl_self = chunked_ranks(
        table, h, targets, bias=bias, compute_dtype=jnp.float32, chunk=16,
        exclude=excl.at[:, 1].set(0),  # same set minus the target entry
    )
    got = chunked_ranks(
        table, h, targets, bias=bias, compute_dtype=jnp.float32, chunk=16,
        exclude=excl,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want_noexcl_self))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 fake devices")
@pytest.mark.parametrize("model_shards", [2, 4])
def test_sharded_exclude_matches_dense_mask(model_shards):
    from seqrec_tpu.eval.sharded import sharded_ranks
    from seqrec_tpu.runtime import make_mesh

    mesh = make_mesh(model_shards)
    table, h, bias, targets, excl = _setup(V=48, num_valid=45)
    want = _dense_oracle(table, h, bias, targets, excl, 45)
    got = sharded_ranks(
        table, h, targets, mesh, bias=bias, num_valid=45, exclude=excl,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_exclusion_improves_rank_semantically():
    """If every history item outscores the target, exclusion removes exactly
    those columns from the rank."""
    V, D = 20, 4
    table = jnp.zeros((V, D), jnp.float32)
    table = table.at[5].set(jnp.asarray([1.0, 0, 0, 0]))  # target: score 1
    hot = jnp.asarray([2.0, 0, 0, 0])
    table = table.at[7].set(hot).at[9].set(1.5 * hot)  # history: higher
    h = jnp.ones((1, D), jnp.float32).at[0, 1:].set(0.0)
    targets = jnp.asarray([5], jnp.int32)
    excl = jnp.asarray([[7, 9, 0]], jnp.int32)
    base = chunked_ranks(table, h, targets, compute_dtype=jnp.float32, chunk=8)
    excluded = chunked_ranks(
        table, h, targets, compute_dtype=jnp.float32, chunk=8, exclude=excl)
    assert int(base[0]) == 2
    assert int(excluded[0]) == 0


def test_first_occurrence_2d():
    x = jnp.asarray([[3, 1, 3, 3, 2], [0, 0, 1, 1, 0]], jnp.int32)
    got = np.asarray(first_occurrence_2d(x))
    want = np.asarray([[1, 1, 0, 0, 1], [1, 0, 1, 0, 0]], bool)
    np.testing.assert_array_equal(got, want)


def test_harness_exclude_history_flag_changes_metrics(tiny_ds):
    """End-to-end: the config knob reaches the dense full path."""
    from seqrec_tpu.config import EvalConfig, ModelConfig
    from seqrec_tpu.eval.harness import evaluate
    from seqrec_tpu.models import build_model

    cfg = ModelConfig(embed_dim=16, dropout_rate=0.0, use_pallas=False,
                      compute_dtype="float32", max_len=20)
    model = build_model(cfg, tiny_ds.vocab_size)
    params = model.init(
        jax.random.key(0),
        jnp.zeros((2, 20), jnp.int32), jnp.ones((2, 20), jnp.float32),
    )
    base = evaluate(model, params, tiny_ds,
                    EvalConfig(exclude_history=False, batch_size=32),
                    split="val", max_len=20)
    excl = evaluate(model, params, tiny_ds,
                    EvalConfig(exclude_history=True, batch_size=32),
                    split="val", max_len=20)
    # Exclusion can only remove higher-scoring competitors: every rank-based
    # metric is monotonically >= its unexcluded value.
    for k in base:
        if k == "count":
            assert base[k] == excl[k]
        else:
            assert excl[k] >= base[k] - 1e-9, (k, excl[k], base[k])
    assert any(excl[k] > base[k] + 1e-12 for k in base if k != "count"), (
        "exclusion changed nothing — knob not wired?"
    )


# ---- vectorized candidate sampler ------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_batch_sampler_properties(seed):
    rng = np.random.default_rng(seed)
    B, T, N, V = 16, 12, 30, 200
    inputs = rng.integers(0, V, size=(B, T)).astype(np.int32)
    inputs[:, -3:] = 0  # pad
    targets = rng.integers(1, V, size=(B,)).astype(np.int32)
    cands = sample_eval_candidates_batch(inputs, targets, N, V, rng)
    assert cands.shape == (B, 1 + N)
    np.testing.assert_array_equal(cands[:, 0], targets)
    for r in range(B):
        negs = cands[r, 1:]
        assert len(set(negs.tolist())) == N, "duplicate negatives"
        assert 0 not in negs
        assert targets[r] not in negs
        assert not (set(negs.tolist()) & set(inputs[r].tolist())), (
            "negative collides with history"
        )


def test_batch_sampler_tight_vocab_forces_multiple_rounds():
    """vocab barely larger than history+negatives: rejection must loop and
    still terminate with exact, distinct negatives."""
    rng = np.random.default_rng(3)
    B, N, V = 4, 10, 18
    inputs = np.tile(np.asarray([[1, 2, 3, 4, 5, 0]], np.int32), (B, 1))
    targets = np.asarray([6, 7, 8, 9], np.int32)
    cands = sample_eval_candidates_batch(inputs, targets, N, V, rng)
    for r in range(B):
        negs = set(cands[r, 1:].tolist())
        assert len(negs) == N
        assert not negs & {0, 1, 2, 3, 4, 5, int(targets[r])}


def test_batch_sampler_single_row_reference_compatible():
    """Same exclusion semantics as the per-row reference sampler (not the
    same draws — RNG consumption differs by construction)."""
    rng = np.random.default_rng(11)
    hist = np.asarray([3, 9, 14], np.int32)
    ref = sample_eval_candidates(hist, 5, 20, 100, rng)
    assert ref[0] == 5
    assert not (set(ref[1:].tolist()) & {3, 9, 14, 5, 0})
    assert len(set(ref[1:].tolist())) == 20
