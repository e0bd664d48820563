"""train.steps_per_call: K steps per compiled call must be EXACTLY the same
training run as K single-step calls (same batches, order, per-step RNG), with
host cadences (log/checkpoint/eval) quantized to group boundaries. See
trainer._group_wires / _train_step_multi_impl."""

import jax
import numpy as np

from seqrec_tpu.config import RunConfig
from seqrec_tpu.train.trainer import Trainer, _crossed, _group_wires


def _cfg(tmp_path, **train_kw):
    cfg = RunConfig()
    cfg.model.embed_dim = 32
    cfg.model.use_pallas = False
    cfg.model.compute_dtype = "float32"
    cfg.model.dropout_rate = 0.0
    cfg.model.loss = "sampled_softmax"
    cfg.model.num_negatives = 32
    cfg.data.batch_size = 32
    cfg.data.max_len = 29
    cfg.train.num_steps = 10
    cfg.train.log_every = 1000
    cfg.train.eval_every = 0
    cfg.train.checkpoint_every = 0
    cfg.train.out_dir = str(tmp_path / "run")
    for k, v in train_kw.items():
        setattr(cfg.train, k, v)
    return cfg


def _leaves(state):
    return [np.asarray(x) for x in jax.tree.leaves(state.params)]


def test_trajectory_identical_to_single_step(tiny_ds, tmp_path):
    """num_steps=10, K=4: two full groups + a 2-step single tail. The final
    params must match the K=1 run to float tolerance (identical math; only
    the XLA program boundaries differ)."""
    s1, _ = Trainer(_cfg(tmp_path / "a"), ds=tiny_ds).fit()
    cfgk = _cfg(tmp_path / "b", steps_per_call=4)
    s4, _ = Trainer(cfgk, ds=tiny_ds).fit()
    assert int(jax.device_get(s4.step)) == 10
    for a, b in zip(_leaves(s1), _leaves(s4)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_checkpoint_resume_across_groups(tiny_ds, tmp_path):
    """checkpoint_every=5 with K=4 saves at the first boundary past each
    multiple (step 8); a killed run resumed from it must land bitwise on the
    straight run's final params (data_position bookkeeping in units of
    batches survives grouping)."""
    straight = _cfg(tmp_path / "s", steps_per_call=4, num_steps=12)
    s_ref, _ = Trainer(straight, ds=tiny_ds).fit()

    killed = _cfg(
        tmp_path / "k", steps_per_call=4, num_steps=12,
        checkpoint_every=5, fail_after_step=8,
    )
    Trainer(killed, ds=tiny_ds).fit()

    resumed = _cfg(
        tmp_path / "k", steps_per_call=4, num_steps=12,
        checkpoint_every=5, resume=True,
    )
    s_res, _ = Trainer(resumed, ds=tiny_ds).fit()
    assert int(jax.device_get(s_res.step)) == 12
    for a, b in zip(_leaves(s_ref), _leaves(s_res)):
        np.testing.assert_array_equal(a, b)


def test_crossed_reduces_to_single_step_cadence():
    for every in (1, 3, 5):
        for step in range(17):
            assert _crossed(every, step, step + 1) == (
                (step + 1) % every == 0
            )
    assert not _crossed(0, 3, 7)  # disabled cadence never fires
    assert _crossed(5, 3, 8)  # boundary (step 4 -> save at 5) inside group
    assert not _crossed(5, 5, 9)


class _FakePack:
    """pack() stand-in: batches are dicts carrying a ready wire (or None)."""

    def __call__(self, batch):
        return batch["wire"]


def _item(bucket, wire_or_none, tag=0):
    w = None
    if wire_or_none is not None:
        w = np.full((2, 3), wire_or_none, np.int16)
    return bucket, {"wire": w, "tag": tag}


def test_group_wires_shapes_and_order():
    items = [_item(30, i) for i in range(7)]
    out = list(_group_wires(iter(items), _FakePack(), 3, limit=7))
    # 7 batches, K=3, limit 7: [3-group, 3-group, single] — the last full
    # group would overshoot nothing here; 7th is a buffer-tail single.
    assert [o[1].shape for o in out] == [(3, 2, 3), (3, 2, 3), (2, 3)]
    flat = np.concatenate(
        [o[1].reshape(-1, 2, 3) if o[1].ndim == 3 else o[1][None]
         for o in out]
    )
    np.testing.assert_array_equal(flat[:, 0, 0], np.arange(7))


def test_group_wires_bucket_change_flushes():
    items = [_item(30, 0), _item(30, 1), _item(50, 2), _item(50, 3),
             _item(50, 4)]
    out = list(_group_wires(iter(items), _FakePack(), 2, limit=5))
    shapes = [o[1].shape for o in out]
    buckets = [o[0] for o in out]
    # bucket flip after 2 staged: the 30s flush as... they reached K first.
    assert shapes == [(2, 2, 3), (2, 2, 3), (2, 3)]
    assert buckets == [30, 50, 50]


def test_group_wires_non_canonical_passthrough_and_flush():
    items = [_item(30, 0), (30, {"wire": None, "tag": 9}), _item(30, 2),
             _item(30, 3)]
    out = list(_group_wires(iter(items), _FakePack(), 2, limit=4))
    # staged single flushes before the dict passes through unchanged
    assert out[0][1].shape == (2, 3)
    assert isinstance(out[1][1], dict) and out[1][1]["tag"] == 9
    assert out[2][1].shape == (2, 2, 3)


def test_group_wires_limit_tail_degrades_to_singles():
    items = [_item(30, i) for i in range(8)]
    out = list(_group_wires(iter(items), _FakePack(), 4, limit=6))
    # one full 4-group fits in limit=6; the next full group (4) would exceed
    # the remaining 2, so it degrades to singles (fit() stops at num_steps).
    assert [o[1].shape for o in out] == [(4, 2, 3)] + [(2, 3)] * 4
