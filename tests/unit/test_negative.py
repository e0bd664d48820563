"""Negative-sampler distribution tests (SURVEY.md §4 unit tier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqrec_tpu.data.negative import (
    log_uniform_log_prob,
    sample_log_uniform,
    sample_negatives,
    sample_uniform,
)


def test_uniform_range_and_logq():
    ids, log_q = sample_uniform(jax.random.key(0), 10_000, vocab_size=101)
    ids = np.asarray(ids)
    assert ids.min() >= 1 and ids.max() <= 100
    np.testing.assert_allclose(np.asarray(log_q), -np.log(100.0), rtol=1e-4)
    # Roughly uniform: each id ~100 hits, allow generous tolerance.
    counts = np.bincount(ids, minlength=101)[1:]
    assert counts.min() > 40 and counts.max() < 200


def test_log_uniform_matches_analytic_distribution():
    V = 51
    ids, _ = sample_log_uniform(jax.random.key(1), 200_000, vocab_size=V)
    ids = np.asarray(ids)
    assert ids.min() >= 1 and ids.max() <= V - 1
    emp = np.bincount(ids, minlength=V)[1:] / len(ids)
    k = np.arange(V - 1, dtype=np.float64)
    ana = np.log((k + 2) / (k + 1)) / np.log(V)
    np.testing.assert_allclose(emp, ana, atol=0.004)
    # log_prob agrees with the analytic pmf.
    lp = np.asarray(log_uniform_log_prob(jnp.arange(1, V), V))
    np.testing.assert_allclose(np.exp(lp), ana, rtol=1e-5)


def test_log_uniform_favors_popular():
    ids, _ = sample_log_uniform(jax.random.key(2), 50_000, vocab_size=1000)
    ids = np.asarray(ids)
    # Frequency-ordered ids: low ids = popular = sampled more.
    assert (ids <= 10).mean() > (ids >= 990).mean() * 5


def test_dispatch():
    for kind in ("uniform", "log_uniform"):
        ids, log_q = sample_negatives(jax.random.key(3), 64, 100, kind)
        assert ids.shape == (64,) and log_q.shape == (64,)


def test_pos_log_prob_matches_sampler_distribution():
    """The positive logQ correction must use the distribution the negatives
    were drawn from: constant -log(V-1) for uniform, the analytic Zipf-ish
    pmf for log_uniform (ADVICE round 1: mixing them biases training)."""
    from seqrec_tpu.data.negative import (
        log_uniform_log_prob,
        pos_log_prob,
    )

    ids = jnp.asarray([1, 5, 99], jnp.int32)
    V = 100
    uni = pos_log_prob(ids, V, "uniform")
    np.testing.assert_allclose(np.asarray(uni), -np.log(V - 1.0), rtol=1e-6)
    lu = pos_log_prob(ids, V, "log_uniform")
    np.testing.assert_allclose(
        np.asarray(lu), np.asarray(log_uniform_log_prob(ids, V)), rtol=1e-6
    )
    with pytest.raises(ValueError):
        pos_log_prob(ids, V, "nope")
