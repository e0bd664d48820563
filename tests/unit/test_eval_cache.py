"""Compile-once eval (VERDICT r1 weak #1): periodic evals must reuse the
jitted step instead of re-tracing/re-compiling a fresh closure per call —
on the axon relay a compile costs 40 s-10 min, paid every eval_every steps
before this fix."""

import numpy as np

from seqrec_tpu.config import RunConfig
from seqrec_tpu.data.dataset import synthetic_dataset
from seqrec_tpu.eval import harness
from seqrec_tpu.train.trainer import Trainer


def _trainer(protocol: str) -> Trainer:
    cfg = RunConfig()
    cfg.model.embed_dim = 16
    cfg.model.dropout_rate = 0.0
    cfg.model.use_pallas = False
    cfg.model.compute_dtype = "float32"
    cfg.data.batch_size = 8
    cfg.data.max_len = 12
    cfg.eval.protocol = protocol
    cfg.eval.batch_size = 16
    cfg.eval.num_negatives = 20
    cfg.eval.max_batches = 2
    cfg.train.out_dir = ""
    ds = synthetic_dataset(num_users=40, num_items=200, seed=3, min_len=4,
                           max_len=13)
    return Trainer(cfg, ds=ds)


def test_second_evaluate_reuses_compiled_full_step():
    tr = _trainer("full")
    state = tr.init_state()
    first = tr.evaluate(state, split="val")
    traces_after_first = harness.trace_counts["full"]
    second = tr.evaluate(state, split="val")
    assert harness.trace_counts["full"] == traces_after_first, (
        "second evaluate() re-traced the full-protocol step"
    )
    for k, v in first.items():
        np.testing.assert_allclose(second[k], v, rtol=1e-6)


def test_second_evaluate_reuses_compiled_sampled_step():
    tr = _trainer("sampled")
    state = tr.init_state()
    tr.evaluate(state, split="val")
    traces_after_first = harness.trace_counts["sampled"]
    tr.evaluate(state, split="val")
    assert harness.trace_counts["sampled"] == traces_after_first, (
        "second evaluate() re-traced the sampled-protocol step"
    )


def test_identical_models_share_cache_entry():
    """flax modules hash structurally: a rebuilt-but-identical model (e.g.
    eval CLI after restore) must hit the same cache entry."""
    tr1 = _trainer("full")
    tr2 = _trainer("full")
    assert tr1.model == tr2.model
    state = tr1.init_state()
    tr1.evaluate(state, split="val")
    n = len(harness._STEP_CACHE)
    tr2.evaluate(state, split="val")
    assert len(harness._STEP_CACHE) == n


def test_step_cache_is_bounded_lru():
    """Churning NON-identical models must not grow the cache without bound
    (VERDICT r2 weak #6: slow leak in a serving process). Entries are plain
    keys here — compiling 20 real models would take minutes for nothing."""
    saved = dict(harness._STEP_CACHE)
    harness._STEP_CACHE.clear()
    try:
        for i in range(harness._STEP_CACHE_MAX + 9):
            harness.lru_put(harness._STEP_CACHE, ("model", i), object())
        assert len(harness._STEP_CACHE) == harness._STEP_CACHE_MAX
        # Oldest evicted, newest retained.
        assert harness.lru_get(harness._STEP_CACHE, ("model", 0)) is None
        assert harness.lru_get(
            harness._STEP_CACHE, ("model", harness._STEP_CACHE_MAX + 8)
        ) is not None
        # A hit refreshes recency: touch the oldest survivor, add one more,
        # and the touched entry must survive while its neighbor is evicted.
        oldest = ("model", 9)
        assert harness.lru_get(harness._STEP_CACHE, oldest) is not None
        harness.lru_put(harness._STEP_CACHE, ("model", 999), object())
        assert harness.lru_get(harness._STEP_CACHE, oldest) is not None
        assert harness.lru_get(harness._STEP_CACHE, ("model", 10)) is None
    finally:
        harness._STEP_CACHE.clear()
        harness._STEP_CACHE.update(saved)


def test_recommend_second_call_reuses_step():
    from seqrec_tpu.eval import infer

    tr = _trainer("full")
    state = tr.init_state()
    histories = [{"user": 0, "history": [3, 5, 9]}]
    list(infer.recommend(tr.model, state.params, histories, k=5,
                         batch_size=4, max_len=12))
    n = len(infer._STEP_CACHE)
    list(infer.recommend(tr.model, state.params, histories, k=5,
                         batch_size=4, max_len=12))
    assert len(infer._STEP_CACHE) == n
