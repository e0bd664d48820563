"""Sharded full-catalog ranking vs. dense oracle on the fake 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqrec_tpu.eval.metrics import mask_scores, ranks_from_scores
from seqrec_tpu.eval.sharded import sharded_ranks, sharded_topk
from seqrec_tpu.parallel.embedding import padded_vocab
from seqrec_tpu.runtime import make_mesh

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 fake devices"
)


def _setup(model_shards, V_true=100, H=16, B=24, seed=0):
    mesh = make_mesh(model_shards)
    V = padded_vocab(V_true, model_shards)
    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.normal(size=(V, H)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(V,)) * 0.1, jnp.float32)
    h = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    targets = jnp.asarray(rng.integers(1, V_true, size=B), jnp.int32)
    return mesh, V, V_true, table, bias, h, targets


def _dense_ranks(table, bias, h, targets, V_true):
    logits = jnp.einsum("bh,vh->bv", h, table) + bias[None, :]
    cols = jnp.arange(table.shape[0])
    logits = jnp.where(cols[None, :] < V_true, logits, -1e30)
    logits = mask_scores(logits.astype(jnp.float32))
    return ranks_from_scores(logits, targets)


@pytest.mark.parametrize("model_shards", [2, 4, 8])
def test_ranks_match_dense(model_shards):
    mesh, V, V_true, table, bias, h, targets = _setup(model_shards)
    got = sharded_ranks(table, h, targets, mesh, bias=bias, num_valid=V_true)
    want = _dense_ranks(table, bias, h, targets, V_true)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_ranks_no_bias():
    mesh, V, V_true, table, _, h, targets = _setup(2, seed=1)
    got = sharded_ranks(table, h, targets, mesh, num_valid=V_true)
    want = _dense_ranks(table, jnp.zeros(V), h, targets, V_true)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("model_shards", [2, 4])
def test_topk_matches_dense(model_shards):
    mesh, V, V_true, table, bias, h, targets = _setup(model_shards, seed=2)
    k = 10
    vals, ids = sharded_topk(table, h, k, mesh, bias=bias, num_valid=V_true)
    logits = jnp.einsum("bh,vh->bv", h, table) + bias[None, :]
    cols = jnp.arange(V)
    logits = jnp.where((cols[None, :] < V_true) & (cols[None, :] != 0),
                       logits, -1e30).astype(jnp.float32)
    dvals, dids = jax.lax.top_k(logits, k)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(dvals), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(dids))


def test_topk_excludes_pad_and_padded_vocab():
    mesh, V, V_true, table, bias, h, _ = _setup(4, seed=3)
    _, ids = sharded_topk(table, h, 20, mesh, bias=bias, num_valid=V_true)
    ids = np.asarray(ids)
    assert (ids != 0).all()
    assert (ids < V_true).all()
