"""Integration tier (SURVEY.md §4): short train→eval with a committed metric
band, and checkpoint save→kill→resume equivalence."""

import jax
import numpy as np
import pytest

from seqrec_tpu.config import RunConfig
from seqrec_tpu.train.trainer import Trainer


def _cfg(tmp_path, **train_kw):
    cfg = RunConfig()
    cfg.model.embed_dim = 32
    cfg.model.use_pallas = False
    cfg.model.compute_dtype = "float32"
    cfg.model.dropout_rate = 0.0
    cfg.data.batch_size = 32
    cfg.data.max_len = 29
    cfg.train.num_steps = 60
    cfg.train.log_every = 1000
    cfg.train.eval_every = 0
    cfg.train.checkpoint_every = 0
    cfg.train.out_dir = str(tmp_path / "run")
    for k, v in train_kw.items():
        setattr(cfg.train, k, v)
    return cfg


def test_golden_train_eval(tiny_ds, tmp_path):
    """Synthetic bigram data has learnable structure: after 60 steps the
    model must beat popularity-chance recall@10 by a wide margin.

    Golden band (committed, CPU, seed=42): recall@10 in [0.25, 0.9].
    Chance for ~50 items is ~0.2 for popularity-only; the bigram signal
    pushes a working model well above it.
    """
    tr = Trainer(_cfg(tmp_path), ds=tiny_ds)
    state, _ = tr.fit()
    m = tr.evaluate(state, split="test")
    assert m["count"] == 100.0
    assert 0.25 <= m["recall@10"] <= 0.95, m
    assert m["mrr@10"] > 0.08, m


def test_golden_sasrec(tiny_ds, tmp_path):
    """SASRec golden band (VERDICT r2 task 4). Committed calibration (CPU,
    seed=42, 80 steps, 2 layers / 1 head / D=32): recall@10 = 0.82,
    mrr@10 = 0.57. Band leaves room for backend/jax-version jitter while
    staying far above the ~0.2 popularity-chance floor."""
    cfg = _cfg(tmp_path, num_steps=80)
    cfg.model.arch = "sasrec"
    cfg.model.num_layers = 2
    cfg.model.num_heads = 1
    tr = Trainer(cfg, ds=tiny_ds)
    state, _ = tr.fit()
    m = tr.evaluate(state, split="test")
    assert m["count"] == 100.0
    assert 0.5 <= m["recall@10"] <= 0.98, m
    assert m["mrr@10"] > 0.3, m


def test_golden_lstm(tiny_ds, tmp_path):
    """LSTM-cell golden band (VERDICT r2 task 4). Committed calibration
    (CPU, seed=42, 60 steps, D=32): recall@10 = 0.67, mrr@10 = 0.31."""
    cfg = _cfg(tmp_path)
    cfg.model.cell_type = "lstm"
    tr = Trainer(cfg, ds=tiny_ds)
    state, _ = tr.fit()
    m = tr.evaluate(state, split="test")
    assert m["count"] == 100.0
    assert 0.4 <= m["recall@10"] <= 0.95, m
    assert m["mrr@10"] > 0.15, m


def test_golden_session_parallel(tiny_ds, tmp_path):
    """Session-parallel TBPTT golden band (VERDICT r2 task 4): the packed
    stream + carried state must LEARN, not just run (shipped config:
    configs/rsc15_gru4rec.json). Committed calibration (CPU, seed=42,
    80 windows of 16, D=32): recall@10 = 0.72, mrr@10 = 0.36."""
    cfg = _cfg(tmp_path, num_steps=80)
    cfg.data.session_parallel = True
    cfg.data.max_len = 16
    tr = Trainer(cfg, ds=tiny_ds)
    state, _ = tr.fit()
    m = tr.evaluate(state, split="test")
    assert m["count"] == 100.0
    assert 0.45 <= m["recall@10"] <= 0.95, m
    assert m["mrr@10"] > 0.15, m


def test_sampled_eval_protocol(tiny_ds, tmp_path):
    cfg = _cfg(tmp_path)
    cfg.eval.protocol = "sampled"
    cfg.eval.num_negatives = 20
    cfg.train.num_steps = 30
    tr = Trainer(cfg, ds=tiny_ds)
    state, _ = tr.fit()
    m = tr.evaluate(state, split="test")
    assert m["count"] == 100.0
    # 1 target + 20 negs: recall@20 can't exceed 1, recall@5 is meaningful.
    assert 0.0 <= m["recall@5"] <= 1.0
    assert m["recall@10"] >= m["recall@5"]


def test_checkpoint_resume_bitwise(tiny_ds, tmp_path):
    """Train 40 steps straight vs. 20 + crash + resume 20: identical params."""
    cfg_a = _cfg(tmp_path / "a", num_steps=40)
    tr_a = Trainer(cfg_a, ds=tiny_ds)
    state_a, _ = tr_a.fit()

    cfg_b = _cfg(tmp_path / "b", num_steps=40, checkpoint_every=20,
                 fail_after_step=20)
    tr_b = Trainer(cfg_b, ds=tiny_ds)
    tr_b.fit()  # exits at step 20 via fault injection

    cfg_b2 = _cfg(tmp_path / "b", num_steps=40, checkpoint_every=20,
                  resume=True)
    tr_b2 = Trainer(cfg_b2, ds=tiny_ds)
    state_b, _ = tr_b2.fit()

    assert int(jax.device_get(state_b.step)) == 40
    flat_a = jax.tree.leaves(state_a.params)
    flat_b = jax.tree.leaves(state_b.params)
    for xa, xb in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


@pytest.mark.parametrize("loss", ["sampled_softmax", "bpr"])
def test_sampled_losses_train(tiny_ds, tmp_path, loss):
    import jax as _jax
    import numpy as _np

    cfg = _cfg(tmp_path)
    cfg.model.loss = loss
    cfg.model.num_negatives = 32
    cfg.train.num_steps = 40
    tr = Trainer(cfg, ds=tiny_ds)
    state, _ = tr.fit()
    m = tr.evaluate(state, split="test")
    assert m["recall@20"] > 0.2, m
    # A post-fit step loss must be finite (guards the inf-logQ-at-pad class
    # of bug, which once produced NaN params that spuriously aced eval).
    # Runs LAST: the train step donates `state`.
    _, batch = next(tr.train_iterator())
    _, metrics = tr._train_step(state, tr.put_batch(batch))
    assert _np.isfinite(float(_jax.device_get(metrics["loss"])))


def test_bucketed_training(tiny_ds, tmp_path):
    cfg = _cfg(tmp_path)
    cfg.data.buckets = (8, 16, 29)
    cfg.train.num_steps = 30
    tr = Trainer(cfg, ds=tiny_ds)
    state, _ = tr.fit()
    assert int(jax.device_get(state.step)) == 30


def test_sparse_checkpoint_resume_bitwise(tiny_ds, tmp_path):
    """Sparse-embedding mode: embed_opt (row-wise optimizer state) must
    round-trip through orbax so crash+resume matches a straight run."""

    def sparse_cfg(out, **kw):
        cfg = _cfg(out, **kw)
        cfg.model.loss = "sampled_softmax"
        cfg.model.num_negatives = 32
        cfg.train.optimizer = "adagrad"
        cfg.train.sparse_embedding_update = True
        return cfg

    cfg_a = sparse_cfg(tmp_path / "sa", num_steps=40)
    state_a, _ = Trainer(cfg_a, ds=tiny_ds).fit()

    cfg_b = sparse_cfg(tmp_path / "sb", num_steps=40, checkpoint_every=20,
                       fail_after_step=20)
    Trainer(cfg_b, ds=tiny_ds).fit()  # exits at step 20 via fault injection

    cfg_b2 = sparse_cfg(tmp_path / "sb", num_steps=40, checkpoint_every=20,
                        resume=True)
    state_b, _ = Trainer(cfg_b2, ds=tiny_ds).fit()

    assert int(jax.device_get(state_b.step)) == 40
    for xa, xb in zip(jax.tree.leaves(state_a.params),
                      jax.tree.leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
    for xa, xb in zip(jax.tree.leaves(state_a.embed_opt),
                      jax.tree.leaves(state_b.embed_opt)):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


@pytest.mark.parametrize("engine", ["python", "native"])
def test_session_parallel_resume_bitwise_no_replay(tiny_ds, tmp_path,
                                                   monkeypatch, engine):
    """Session-parallel kill/resume (VERDICT r2 task 8): straight 40-window
    run == 20 + crash + resume 20, bitwise — and the resume must go through
    the stream's restore (O(1) lane-state snapshot), not batch replay. Both
    loader engines (python SessionStream, native C++ srs_*) keep the
    contract; their snapshots carry the engine kind so each resumes its
    own."""
    from seqrec_tpu.data import batching, native

    if engine == "native" and not native.available():
        pytest.skip("native engine not built")
    cls = (native.NativeSessionLoader if engine == "native"
           else batching.SessionStream)

    def sp_cfg(out, **kw):
        cfg = _cfg(out, **kw)
        cfg.data.session_parallel = True
        cfg.data.use_native_loader = engine == "native"
        cfg.data.max_len = 16
        return cfg

    state_a, _ = Trainer(sp_cfg(tmp_path / "a", num_steps=40), ds=tiny_ds).fit()

    cfg_b = sp_cfg(tmp_path / "b", num_steps=40, checkpoint_every=20,
                   fail_after_step=20)
    Trainer(cfg_b, ds=tiny_ds).fit()

    calls = {"restore": 0, "next": 0}
    orig_restore = cls.restore
    orig_next = cls.__next__

    def spy_restore(self, st):
        calls["restore"] += 1
        return orig_restore(self, st)

    def spy_next(self):
        calls["next"] += 1
        return orig_next(self)

    monkeypatch.setattr(cls, "restore", spy_restore)
    monkeypatch.setattr(cls, "__next__", spy_next)
    cfg_b2 = sp_cfg(tmp_path / "b", num_steps=40, checkpoint_every=20,
                    resume=True)
    state_b, _ = Trainer(cfg_b2, ds=tiny_ds).fit()

    assert calls["restore"] == 1
    # 20 remaining windows + prefetch read-ahead (DevicePrefetcher depth 2
    # plus the native engine's own ring; how far the feeder runs ahead is
    # timing-dependent). Far below 40 — replay would have pulled the first
    # 20 again.
    assert calls["next"] <= 20 + 12, calls

    assert int(jax.device_get(state_b.step)) == 40
    for xa, xb in zip(jax.tree.leaves(state_a.params),
                      jax.tree.leaves(state_b.params)):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
    # The TBPTT carry must also survive the round-trip.
    for xa, xb in zip(jax.tree.leaves(state_a.carry),
                      jax.tree.leaves(state_b.carry)):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
