"""Direct math tests for the ranking loss heads (SURVEY.md §2 #10-12 plus
the GRU4Rec-lineage top1/bpr_max extensions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqrec_tpu.ops import xla as xla_ops


def _toy(seed=0, N=6, S=8, H=16):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.normal(size=(N, H)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(N, H)), jnp.float32)
    neg = jnp.asarray(rng.normal(size=(S, H)), jnp.float32)
    targets = jnp.asarray(rng.integers(1, 50, size=N), jnp.int32)
    neg_ids = jnp.asarray(rng.integers(50, 100, size=S), jnp.int32)  # no hits
    w = jnp.ones((N,), jnp.float32)
    return h, pos, neg, targets, neg_ids, w


LOSSES = {
    "bpr": xla_ops.bpr_loss,
    "top1": xla_ops.top1_loss,
    "bpr_max": xla_ops.bpr_max_loss,
}


@pytest.mark.parametrize("name", sorted(LOSSES))
def test_finite_and_positive(name):
    fn = LOSSES[name]
    s, w = fn(*_toy())
    assert jnp.isfinite(s)
    assert float(s) > 0.0
    assert float(w) == 6.0


@pytest.mark.parametrize("name", sorted(LOSSES))
def test_better_pos_scores_lower_loss(name):
    """Scaling the positive embedding toward h (raising pos logits) must
    strictly reduce every pairwise ranking loss."""
    fn = LOSSES[name]
    h, pos, neg, targets, neg_ids, w = _toy()
    base, _ = fn(h, pos, neg, targets, neg_ids, w)
    better, _ = fn(h, pos + 2.0 * h, neg, targets, neg_ids, w)
    assert float(better) < float(base)


@pytest.mark.parametrize("name", sorted(LOSSES))
def test_accidental_hits_excluded(name):
    """Making a negative collide with every row's target must not blow up the
    loss — the hit column is excluded, so moving that column's embedding
    must leave the loss unchanged."""
    fn = LOSSES[name]
    h, pos, neg, targets, neg_ids, w = _toy()
    tgt0 = jnp.full_like(targets, 7)
    ids = neg_ids.at[0].set(7)  # column 0 collides with every target
    l1, _ = fn(h, pos, neg, tgt0, ids, w)
    neg2 = neg.at[0].set(neg[0] + 100.0)
    l2, _ = fn(h, pos, neg2, tgt0, ids, w)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


@pytest.mark.parametrize("name", sorted(LOSSES))
def test_zero_weight_rows_ignored(name):
    fn = LOSSES[name]
    h, pos, neg, targets, neg_ids, w = _toy()
    full, wsum = fn(h, pos, neg, targets, neg_ids, w)
    # Zero out row 0's weight AND corrupt its inputs: loss must equal the
    # loss over rows 1.. only.
    w0 = w.at[0].set(0.0)
    h_bad = h.at[0].set(1e4)
    part, wsum0 = fn(h_bad, pos, neg, targets, neg_ids, w0)
    ref, _ = fn(h[1:], pos[1:], neg, targets[1:], neg_ids, w[1:])
    np.testing.assert_allclose(float(part), float(ref), rtol=1e-5)
    assert float(wsum0) == float(wsum) - 1.0


def test_bpr_max_regularizer_penalizes_large_neg_scores():
    h, pos, neg, targets, neg_ids, w = _toy()
    l_reg, _ = xla_ops.bpr_max_loss(h, pos, neg, targets, neg_ids, w, reg=1.0)
    l_noreg, _ = xla_ops.bpr_max_loss(h, pos, neg, targets, neg_ids, w, reg=0.0)
    assert float(l_reg) > float(l_noreg)


def test_top1_grads_finite():
    h, pos, neg, targets, neg_ids, w = _toy()

    def f(h, pos, neg):
        s, ws = xla_ops.top1_loss(h, pos, neg, targets, neg_ids, w)
        return s / ws

    grads = jax.grad(f, argnums=(0, 1, 2))(h, pos, neg)
    for g in grads:
        assert bool(jnp.isfinite(g).all())
