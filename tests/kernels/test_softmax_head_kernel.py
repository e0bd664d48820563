"""Fused sampled-softmax head vs. XLA oracle: loss + grad parity."""

import jax
import jax.numpy as jnp
import numpy as np

from seqrec_tpu.data.negative import log_uniform_log_prob
from seqrec_tpu.ops import xla as xla_ops
from seqrec_tpu.ops.pallas import softmax_head as pl_head


def _setup(N=70, H=16, S=24, V=100, seed=0):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.normal(size=(N, H)), jnp.float32)
    pos_emb = jnp.asarray(rng.normal(size=(N, H)), jnp.float32)
    neg_emb = jnp.asarray(rng.normal(size=(S, H)), jnp.float32)
    targets = jnp.asarray(rng.integers(1, V, size=N), jnp.int32)
    neg_ids = jnp.asarray(rng.integers(1, V, size=S), jnp.int32)
    # Force a few accidental hits.
    neg_ids = neg_ids.at[0].set(targets[3])
    weights = jnp.asarray((rng.random(N) > 0.3).astype(np.float32))
    plq = log_uniform_log_prob(targets, V)
    nlq = log_uniform_log_prob(neg_ids, V)
    return h, pos_emb, neg_emb, targets, neg_ids, weights, plq, nlq


def test_loss_parity():
    h, pos, neg, tgt, nid, w, plq, nlq = _setup()
    ref = xla_ops.sampled_softmax_loss(h, pos, neg, tgt, nid, w,
                                       pos_log_q=plq, neg_log_q=nlq)
    got = pl_head.sampled_softmax_loss(h, pos, neg, tgt, nid, w,
                                       pos_log_q=plq, neg_log_q=nlq,
                                       interpret=True)
    np.testing.assert_allclose(float(got[0]), float(ref[0]), rtol=1e-5)
    assert float(got[1]) == float(ref[1])


def test_loss_parity_no_logq():
    h, pos, neg, tgt, nid, w, _, _ = _setup(seed=1)
    ref = xla_ops.sampled_softmax_loss(h, pos, neg, tgt, nid, w)
    got = pl_head.sampled_softmax_loss(h, pos, neg, tgt, nid, w,
                                       interpret=True)
    np.testing.assert_allclose(float(got[0]), float(ref[0]), rtol=1e-5)


def test_grad_parity():
    h, pos, neg, tgt, nid, w, plq, nlq = _setup(N=40, seed=2)

    def f_ref(h, pos, neg):
        s, n = xla_ops.sampled_softmax_loss(h, pos, neg, tgt, nid, w,
                                            pos_log_q=plq, neg_log_q=nlq)
        return s / n

    def f_pl(h, pos, neg):
        s, n = pl_head.sampled_softmax_loss(h, pos, neg, tgt, nid, w,
                                            pos_log_q=plq, neg_log_q=nlq,
                                            interpret=True)
        return s / n

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(h, pos, neg)
    g_pl = jax.grad(f_pl, argnums=(0, 1, 2))(h, pos, neg)
    for a, b, name in zip(g_pl, g_ref, ["h", "pos", "neg"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5,
            err_msg=f"grad mismatch: {name}",
        )
