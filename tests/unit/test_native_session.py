"""Native C++ session-stream engine (native/seqrec_data.cc srs_*): same
stream semantics as data/batching.SessionStream — dense packed windows,
reset-at-session-start, lanes carrying sessions across windows, O(1)
snapshot resume — plus in-engine wire packing (trainer's compact session
format). The Python stream is the semantic oracle; the two use different
shuffle rngs, so invariants and round-trips are pinned, not byte order."""

import numpy as np
import pytest

from seqrec_tpu.config import RunConfig
from seqrec_tpu.data import native
from seqrec_tpu.data.dataset import synthetic_dataset
from seqrec_tpu.train.trainer import Trainer

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native engine not built"
)


@pytest.fixture(scope="module")
def tr(tiny_ds):
    cfg = RunConfig()
    cfg.model.embed_dim = 16
    cfg.model.use_pallas = False
    cfg.data.batch_size = 4
    cfg.data.max_len = 16
    cfg.data.session_parallel = True
    cfg.train.out_dir = ""
    return Trainer(cfg, ds=tiny_ds)


def _loader(ds, tr, **kw):
    T, E, _ = tr._session_wire_cols
    args = dict(batch_size=4, window=T, ends_budget=E, wire_dtype=np.int16,
                seed=3)
    args.update(kw)
    return native.NativeSessionLoader(ds, **args)


def _planes(tr, payload):
    """Either payload kind -> {inputs, targets, mask, reset} numpy planes."""
    if isinstance(payload, dict):
        return payload
    import jax

    return jax.tree.map(np.asarray, tr._unpack_session_wire(payload))


def test_windows_are_dense_and_chain(tiny_ds, tr):
    it = _loader(tiny_ds, tr)
    prev_tail = {}
    for _ in range(12):
        w, payload = next(it)
        assert w == 16
        b = _planes(tr, payload)
        assert (b["mask"] == 1.0).all()
        assert (b["inputs"] > 0).all() and (b["targets"] > 0).all()
        for r in range(4):
            ins, tgt, rst = b["inputs"][r], b["targets"][r], b["reset"][r]
            for t in range(15):
                if rst[t + 1] == 0.0:
                    assert ins[t + 1] == tgt[t]
            if r in prev_tail and rst[0] == 0.0:
                assert ins[0] == prev_tail[r]
            prev_tail[r] = tgt[15]
    it.close()


def test_covers_all_pairs(tiny_ds, tr):
    want = set()
    total_pairs = 0
    for u in range(tiny_ds.num_users):
        s = tiny_ds.train_seq(u)
        for i in range(len(s) - 1):
            want.add((int(s[i]), int(s[i + 1])))
        total_pairs += max(len(s) - 1, 0)
    it = _loader(tiny_ds, tr)
    got = set()
    for _ in range(2 * (total_pairs // (4 * 16) + 1)):
        _, payload = next(it)
        b = _planes(tr, payload)
        for r in range(4):
            for t in range(16):
                got.add((int(b["inputs"][r, t]), int(b["targets"][r, t])))
    it.close()
    assert want <= got


def test_snapshot_restore_continues_identically(tiny_ds, tr):
    it = _loader(tiny_ds, tr)
    batches = [next(it) for _ in range(8)]
    snap = it.state_at(3)
    assert snap["engine"] == "native" and snap["count"] == 3
    it2 = _loader(tiny_ds, tr)
    it2.restore(snap)
    for k in range(3, 8):
        _, payload2 = next(it2)
        a = _planes(tr, batches[k][1])
        b = _planes(tr, payload2)
        for key in ("inputs", "targets", "mask", "reset"):
            np.testing.assert_array_equal(a[key], b[key], err_msg=key)
    it.close()
    it2.close()


def test_state_at_live_head_peeks(tiny_ds, tr):
    """state_at(n) at the not-yet-pulled head (synchronous feed / final
    save) must work via the one-batch peek, without skipping the batch."""
    it = _loader(tiny_ds, tr)
    for _ in range(2):
        next(it)
    snap = it.state_at(2)  # head: batch 2 not pulled yet
    assert snap["count"] == 2
    _, payload = next(it)  # the peeked batch must still be delivered
    it2 = _loader(tiny_ds, tr)
    it2.restore(snap)
    _, payload2 = next(it2)
    a, b = _planes(tr, payload), _planes(tr, payload2)
    for key in ("inputs", "targets", "reset"):
        np.testing.assert_array_equal(a[key], b[key], err_msg=key)
    it.close()
    it2.close()


def test_over_budget_windows_fall_back_to_planes(tr):
    """A dataset of 1-pair sessions (raw len 4 -> train len 2) makes every
    position a session start: more ends than E, so the engine must emit
    planes, and they must still chain correctly."""
    ds = synthetic_dataset(200, 50, seed=5, min_len=4, max_len=5)
    it = _loader(ds, tr)
    w, payload = next(it)
    assert isinstance(payload, dict), "over-budget window should be planes"
    _, E, _ = tr._session_wire_cols
    # 1-2-pair sessions: every lane has more session starts than E slots.
    assert (payload["reset"].sum(axis=1) > E).any()
    assert (payload["mask"] == 1.0).all()
    it.close()


def test_wire_matches_python_packer(tiny_ds, tr):
    """C++-packed wire == trainer.pack_session_batch of the same planes
    (unpack then re-pack must be the identity on the wire)."""
    it = _loader(tiny_ds, tr)
    checked = 0
    for _ in range(8):
        _, payload = next(it)
        if isinstance(payload, dict):
            continue
        planes = _planes(tr, payload)
        # pack_session_batch expects the trainer's T (module cfg max_len=16).
        repacked = tr.pack_session_batch(planes)
        assert repacked is not None
        np.testing.assert_array_equal(repacked, payload)
        checked += 1
    it.close()
    assert checked > 0
