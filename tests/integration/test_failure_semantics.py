"""Failure-handling semantics (SURVEY.md §5.2/§5.5): debug_nans must DETECT
and halt with the failing step; sanitize_nans must keep training on zeroed
gradients; TensorBoard mirroring must produce event files."""

import os

import numpy as np
import pytest

from seqrec_tpu.config import RunConfig
from seqrec_tpu.train.trainer import Trainer


def _cfg(tmp_path, **train_kw):
    cfg = RunConfig()
    cfg.model.embed_dim = 16
    cfg.model.use_pallas = False
    cfg.model.compute_dtype = "float32"
    cfg.model.dropout_rate = 0.0
    cfg.data.batch_size = 16
    cfg.data.max_len = 29
    cfg.train.num_steps = 8
    cfg.train.log_every = 1000
    cfg.train.eval_every = 0
    cfg.train.checkpoint_every = 0
    cfg.train.out_dir = str(tmp_path / "run")
    for k, v in train_kw.items():
        setattr(cfg.train, k, v)
    return cfg


def _poison_iterator(tr: Trainer, at_step: int):
    """Wrap the trainer's iterator so batch `at_step` carries NaN mask —
    NaN flows through loss and every gradient (the real detection path)."""
    orig = tr.train_iterator

    def poisoned(**kw):
        for i, (b, batch) in enumerate(orig(**kw)):
            if i == at_step:
                batch = dict(batch, mask=batch["mask"] * np.nan)
            yield b, batch

    tr.train_iterator = poisoned


def test_debug_nans_halts_with_step_number(tiny_ds, tmp_path):
    tr = Trainer(_cfg(tmp_path, debug_nans=True), ds=tiny_ds)
    _poison_iterator(tr, at_step=3)
    with pytest.raises(FloatingPointError, match="step 3"):
        tr.fit()


def test_sanitize_nans_keeps_training(tiny_ds, tmp_path):
    import jax

    tr = Trainer(_cfg(tmp_path, sanitize_nans=True), ds=tiny_ds)
    _poison_iterator(tr, at_step=3)
    state, _ = tr.fit()
    assert int(jax.device_get(state.step)) == 8
    for leaf in jax.tree.leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_debug_nans_off_does_not_sync(tiny_ds, tmp_path):
    """Default mode must neither halt nor sanitize: a NaN batch poisons the
    params (documented behavior — detection is opt-in because the per-step
    fetch synchronizes the loop)."""
    import jax

    tr = Trainer(_cfg(tmp_path), ds=tiny_ds)
    _poison_iterator(tr, at_step=3)
    state, _ = tr.fit()
    assert int(jax.device_get(state.step)) == 8
    leaves = [np.asarray(x) for x in jax.tree.leaves(state.params)]
    assert any(not np.isfinite(x).all() for x in leaves)


def test_tensorboard_event_files(tiny_ds, tmp_path):
    pytest.importorskip("torch.utils.tensorboard")
    cfg = _cfg(tmp_path, tensorboard=True, log_every=2)
    tr = Trainer(cfg, ds=tiny_ds)
    tr.fit()
    tb_dir = os.path.join(cfg.train.out_dir, "tb")
    assert os.path.isdir(tb_dir)
    assert any(f.startswith("events") for f in os.listdir(tb_dir))
