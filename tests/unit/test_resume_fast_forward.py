"""Checkpoint-resume fast-forward: `skip_batches=N` must reproduce the live
stream's batch N onward bit-identically, in both the Python batcher and the
native C++ engine, without replaying batch assembly (SURVEY.md §5.4)."""

import itertools
import time

import numpy as np
import pytest

from seqrec_tpu.data import native
from seqrec_tpu.data.batching import make_train_batches
from seqrec_tpu.data.dataset import synthetic_dataset


def _assert_same_batches(ref, got, n):
    for i in range(n):
        rb, rbatch = next(ref)
        gb, gbatch = next(got)
        assert rb == gb, f"bucket mismatch at offset {i}"
        for k in rbatch:
            np.testing.assert_array_equal(
                rbatch[k], gbatch[k], err_msg=f"key {k} at offset {i}"
            )


@pytest.fixture(scope="module")
def ds():
    # Small users so epochs are short and skips cross many epoch boundaries.
    return synthetic_dataset(60, 50, seed=3, min_len=3, max_len=25)


@pytest.mark.parametrize("skip", [0, 1, 7, 33, 130])
@pytest.mark.parametrize("buckets", [(), (8, 16)])
def test_python_skip_matches_replay(ds, skip, buckets):
    kw = dict(batch_size=4, max_len=20, buckets=buckets, seed=11)
    ref = make_train_batches(ds, **kw)
    for _ in range(skip):
        next(ref)
    got = make_train_batches(ds, **kw, skip_batches=skip)
    _assert_same_batches(ref, got, 25)


def test_python_skip_respects_host_shard(ds):
    kw = dict(batch_size=4, max_len=20, buckets=(8, 16), seed=5,
              host_shard=(1, 2))
    ref = make_train_batches(ds, **kw)
    for _ in range(19):
        next(ref)
    got = make_train_batches(ds, **kw, skip_batches=19)
    _assert_same_batches(ref, got, 10)


def test_python_skip_rejects_finite_epochs(ds):
    with pytest.raises(ValueError, match="infinite"):
        next(make_train_batches(
            ds, batch_size=4, max_len=20, seed=0, num_epochs=1,
            skip_batches=3,
        ))


def test_python_million_batch_skip_is_fast():
    """VERDICT r1 #5 done-criterion: resume at a 10⁶-batch position in
    seconds. Vectorized fast-forward does one permutation + a few cumsums
    per epoch — no batch assembly."""
    big = synthetic_dataset(5000, 200, seed=0, min_len=4, max_len=40)
    t0 = time.perf_counter()
    it = make_train_batches(
        big, batch_size=2, max_len=30, buckets=(10, 20), seed=1,
        skip_batches=1_000_000,
    )
    next(it)  # force the fast-forward + first real batch
    assert time.perf_counter() - t0 < 30.0


@pytest.mark.skipif(not native.available(),
                    reason="native lib not built (make -C native)")
@pytest.mark.parametrize("skip", [0, 5, 41])
def test_native_skip_matches_replay(ds, skip):
    kw = dict(batch_size=4, max_len=20, buckets=(8, 16), seed=7)
    ref = native.NativeTrainLoader(ds, **kw)
    got = native.NativeTrainLoader(ds, **kw, skip_batches=skip)
    try:
        for _ in range(skip):
            next(ref)
        _assert_same_batches(ref, got, 25)
    finally:
        ref.close()
        got.close()


@pytest.mark.skipif(not native.available(),
                    reason="native lib not built (make -C native)")
def test_native_million_batch_skip_is_fast():
    big = synthetic_dataset(5000, 200, seed=0, min_len=4, max_len=40)
    t0 = time.perf_counter()
    loader = native.NativeTrainLoader(
        big, batch_size=2, max_len=30, buckets=(10, 20), seed=1,
        skip_batches=1_000_000,
    )
    try:
        next(loader)
        assert time.perf_counter() - t0 < 30.0
    finally:
        loader.close()


# ---- session-parallel lane-state snapshots (SURVEY.md §5.4; VERDICT r2 #8) --


def _assert_same_session_batches(ref, got, n):
    for i in range(n):
        rb, rbatch = next(ref)
        gb, gbatch = next(got)
        assert rb == gb
        for k in rbatch:
            np.testing.assert_array_equal(
                rbatch[k], gbatch[k], err_msg=f"key {k} at offset {i}"
            )


@pytest.mark.parametrize("consumed", [0, 1, 9, 57])
def test_session_stream_snapshot_restore(ds, consumed):
    """state_at(n) + restore reproduces batch n onward bit-identically,
    including across epoch boundaries (60 short sessions -> an epoch is a
    handful of windows), with NO replay."""
    from seqrec_tpu.data.batching import make_session_stream

    kw = dict(batch_size=4, window=12, seed=11)
    ref = make_session_stream(ds, **kw)
    for _ in range(consumed):
        next(ref)
    snap = ref.state_at(consumed)

    fresh = make_session_stream(ds, **kw)
    fresh.restore(snap)
    _assert_same_session_batches(ref, fresh, 10)


def test_session_stream_ring_covers_prefetch_readahead(ds):
    """The feeder thread runs ahead of the train loop; state_at must serve
    positions a few batches BEHIND the newest emission."""
    from seqrec_tpu.data.batching import make_session_stream

    kw = dict(batch_size=4, window=12, seed=11)
    live = make_session_stream(ds, **kw)
    batches = [next(live) for _ in range(8)]  # head is now 8

    snap = live.state_at(5)  # loop position 3 behind the feeder head
    fresh = make_session_stream(ds, **kw)
    fresh.restore(snap)
    for i in range(5, 8):
        gb, gbatch = next(fresh)
        rb, rbatch = batches[i]
        assert gb == rb
        for k in rbatch:
            np.testing.assert_array_equal(rbatch[k], gbatch[k])

    with pytest.raises(KeyError):
        make_session_stream(ds, **kw).state_at(3)  # fresh stream: only 0


def test_session_stream_snapshot_is_json_small(ds):
    """The snapshot must be JSON-serializable and O(batch_size) — it rides
    in the orbax checkpoint's JSON metadata."""
    import json

    from seqrec_tpu.data.batching import make_session_stream

    s = make_session_stream(ds, batch_size=4, window=12, seed=11)
    for _ in range(20):
        next(s)
    snap = s.state_at(20)
    enc = json.dumps(snap)
    assert len(enc) < 4096
    dec = json.loads(enc)
    fresh = make_session_stream(ds, batch_size=4, window=12, seed=11)
    fresh.restore(dec)
    _assert_same_session_batches(s, fresh, 5)
