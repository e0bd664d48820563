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
