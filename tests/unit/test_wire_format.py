"""Compact train-batch wire format (trainer.pack_train_batch /
_unpack_wire): H2D bytes are the measured pipeline bottleneck, so bucketed
train batches ship as ONE [B, T+2] token array and the compiled step
rebuilds {inputs, targets, mask, users} on device."""

import jax
import numpy as np
import pytest

from seqrec_tpu.config import RunConfig
from seqrec_tpu.data.batching import make_train_batches
from seqrec_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def tr(tiny_ds):
    cfg = RunConfig()
    cfg.model.embed_dim = 16
    cfg.model.use_pallas = False
    cfg.data.batch_size = 8
    cfg.data.max_len = 20
    cfg.train.out_dir = ""
    return Trainer(cfg, ds=tiny_ds)


def _loader_batches(ds, n, **kw):
    it = make_train_batches(ds, **kw)
    return [next(it)[1] for _ in range(n)]


def test_pack_unpack_roundtrip(tr, tiny_ds):
    """targets, mask, users survive exactly; inputs survive at every
    unmasked position (the first pad slot legitimately carries the sequence
    continuation — loss-masked, see _unpack_wire docstring)."""
    for batch in _loader_batches(tiny_ds, 5, batch_size=8, max_len=20, seed=3):
        packed = tr.pack_train_batch(batch)
        assert packed is not None
        assert packed.dtype == np.int16  # tiny vocab fits the narrow wire
        got = jax.tree.map(np.asarray, tr._unpack_wire(packed))
        np.testing.assert_array_equal(got["targets"], batch["targets"])
        np.testing.assert_array_equal(got["mask"], batch["mask"])
        np.testing.assert_array_equal(got["users"], batch["users"])
        m = batch["mask"] > 0
        np.testing.assert_array_equal(got["inputs"][m], batch["inputs"][m])


def test_pack_rejects_non_canonical(tr, tiny_ds):
    batch = _loader_batches(tiny_ds, 1, batch_size=8, max_len=20, seed=3)[0]
    poisoned = dict(batch, mask=batch["mask"] * np.nan)
    assert tr.pack_train_batch(poisoned) is None  # NaN-poisoned mask
    weighted = dict(batch, mask=batch["mask"] * 0.5)
    assert tr.pack_train_batch(weighted) is None  # custom loss weights
    shuffled = dict(batch, targets=batch["targets"][:, ::-1].copy(),
                    mask=(batch["targets"][:, ::-1] != 0).astype(np.float32))
    assert tr.pack_train_batch(shuffled) is None  # not next-item shifted
    sess = dict(batch, reset=np.zeros_like(batch["mask"]))
    assert tr.pack_train_batch(sess) is None  # session windows ship as dict


def test_wire_dtype_widens_for_large_vocab(tiny_ds):
    from seqrec_tpu.data.dataset import synthetic_dataset

    cfg = RunConfig()
    cfg.model.embed_dim = 8
    cfg.model.use_pallas = False
    cfg.data.batch_size = 4
    cfg.data.max_len = 10
    cfg.train.out_dir = ""
    big = synthetic_dataset(50, 40_000, seed=1, min_len=3, max_len=12)
    tr_big = Trainer(cfg, ds=big)
    assert tr_big._wire_dtype == np.int32


def test_packed_step_matches_dict_step(tr, tiny_ds):
    """Same batch through the packed wire vs. the dict path: identical loss
    and gradient norm (the reconstruction difference at the first pad slot
    is provably inert)."""
    batch = _loader_batches(tiny_ds, 1, batch_size=8, max_len=20, seed=3)[0]
    state1 = tr.init_state(seed=5)
    _, m_packed = tr._train_step(state1, tr.put_batch(batch))
    state2 = tr.init_state(seed=5)
    dict_dev = {
        k: jax.make_array_from_process_local_data(tr._batch_sharding, v)
        for k, v in batch.items()
    }
    _, m_dict = tr._train_step(state2, dict_dev)
    np.testing.assert_allclose(
        float(m_packed["loss"]), float(m_dict["loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(m_packed["grad_norm"]), float(m_dict["grad_norm"]), rtol=1e-5
    )
