"""Chunked full-catalog ranking (eval/chunked.py) vs. the dense oracle
(mask_scores + full_logits + ranks_from_scores): identical ranks/metrics."""

import jax
import jax.numpy as jnp
import numpy as np

from seqrec_tpu.config import RunConfig
from seqrec_tpu.data.dataset import synthetic_dataset
from seqrec_tpu.eval.chunked import chunked_ranks
from seqrec_tpu.eval.harness import evaluate
from seqrec_tpu.eval.metrics import mask_scores, ranks_from_scores
from seqrec_tpu.ops.xla import full_logits
from seqrec_tpu.train.trainer import Trainer


def _dense_ranks(table, h, targets, bias, num_valid):
    scores = full_logits(h, table, bias).astype(jnp.float32)
    if num_valid < table.shape[0]:
        cols = jnp.arange(table.shape[0])
        scores = jnp.where(cols[None] < num_valid, scores, -1e30)
    return ranks_from_scores(mask_scores(scores), targets)


def test_chunked_matches_dense_ranks():
    rng = np.random.default_rng(0)
    V, D, B = 1000, 16, 32
    table = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(V,)), jnp.float32)
    targets = jnp.asarray(rng.integers(1, 900, size=B), jnp.int32)
    for num_valid in (V, 900):
        dense = _dense_ranks(table, h, targets, bias, num_valid)
        # chunk=130 does not divide V: exercises the padded tail block.
        ch = chunked_ranks(table, h, targets, bias=bias,
                           num_valid=num_valid,
                           compute_dtype=jnp.float32, chunk=130)
        np.testing.assert_array_equal(np.asarray(ch), np.asarray(dense))


def test_chunked_no_bias_and_nan_target():
    rng = np.random.default_rng(1)
    V, D, B = 257, 8, 4
    table = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    h = h.at[2].set(jnp.nan)  # row 2's target score becomes NaN
    targets = jnp.asarray([5, 17, 100, 200], jnp.int32)
    ch = chunked_ranks(table, h, targets, bias=None, num_valid=V,
                       compute_dtype=jnp.float32, chunk=64)
    dense = _dense_ranks(table, h, targets, None, V)
    np.testing.assert_array_equal(np.asarray(ch), np.asarray(dense))
    assert int(ch[2]) == V  # NaN ranks last


def test_evaluate_full_chunked_matches_unchunked():
    cfg = RunConfig()
    cfg.model.embed_dim = 16
    cfg.model.max_len = 10
    cfg.model.dropout_rate = 0.0
    cfg.model.use_pallas = False
    cfg.model.compute_dtype = "float32"
    cfg.data.batch_size = 8
    cfg.data.max_len = 10
    cfg.train.out_dir = ""
    ds = synthetic_dataset(num_users=40, num_items=300, seed=0, min_len=4,
                           max_len=11)
    tr = Trainer(cfg, ds=ds)
    state = tr.init_state()

    cfg.eval.protocol = "full"
    base = evaluate(tr.model, state.params, ds, cfg.eval, split="val",
                    max_len=10)
    cfg.eval.full_chunk_items = 77  # force chunking, awkward block size
    chunked = evaluate(tr.model, state.params, ds, cfg.eval, split="val",
                       max_len=10)
    for k, v in base.items():
        np.testing.assert_allclose(chunked[k], v, rtol=1e-6,
                                   err_msg=f"metric {k} diverged")


def test_chunked_topk_matches_dense():
    from seqrec_tpu.eval.chunked import chunked_topk

    rng = np.random.default_rng(3)
    V, D, B, k = 500, 16, 8, 12
    table = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(V,)), jnp.float32)
    num_valid = 450

    scores = full_logits(h, table, bias).astype(jnp.float32)
    cols = jnp.arange(V)
    scores = jnp.where(cols[None] < num_valid, scores, -jnp.inf)
    scores = mask_scores(scores)
    dv, di = jax.lax.top_k(scores, k)

    # chunk=123 does not divide V: exercises the clamped tail block.
    cv, ci = chunked_topk(table, h, k, bias=bias, num_valid=num_valid,
                          compute_dtype=jnp.float32, chunk=123)
    np.testing.assert_array_equal(np.asarray(ci), np.asarray(di))
    np.testing.assert_allclose(np.asarray(cv), np.asarray(dv), rtol=1e-6)


def test_recommend_chunked_path_matches_dense(monkeypatch):
    """Force the chunked auto-rule on and check recommend() output parity."""
    import seqrec_tpu.eval.infer as infer_mod

    cfg = RunConfig()
    cfg.model.embed_dim = 16
    cfg.model.max_len = 10
    cfg.model.dropout_rate = 0.0
    cfg.model.use_pallas = False
    cfg.model.compute_dtype = "float32"
    cfg.data.batch_size = 4
    cfg.data.max_len = 10
    cfg.train.out_dir = ""
    ds = synthetic_dataset(num_users=30, num_items=300, seed=1, min_len=4,
                           max_len=11)
    tr = Trainer(cfg, ds=ds)
    state = tr.init_state()
    histories = [{"user": 0, "history": [3, 5, 9]},
                 {"user": 1, "history": [20, 7]}]

    dense = list(infer_mod.recommend(tr.model, state.params, histories, k=5,
                                     batch_size=4, max_len=10))
    # Shrink the auto threshold so this tiny catalog takes the chunked
    # branch, with an awkward block size that does not divide the vocab.
    import seqrec_tpu.eval.chunked as chunked_mod

    monkeypatch.setattr(infer_mod, "CHUNK_THRESHOLD_BYTES", 0)
    monkeypatch.setattr(chunked_mod, "DEFAULT_CHUNK", 97)
    chunked = list(infer_mod.recommend(tr.model, state.params, histories,
                                       k=5, batch_size=4, max_len=10))
    assert len(dense) == len(chunked) == 2
    for a, b in zip(dense, chunked):
        assert a["items"] == b["items"]
        np.testing.assert_allclose(a["scores"], b["scores"], rtol=1e-6)
