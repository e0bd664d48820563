"""Native C++ data engine vs. the Python BucketBatcher oracle."""

import numpy as np
import pytest

from seqrec_tpu.data import native
from seqrec_tpu.data.dataset import synthetic_dataset

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built (make -C native)"
)


def _collect(loader, n):
    out = []
    for _ in range(n):
        out.append(next(loader))
    return out


def test_batch_invariants(tiny_ds):
    loader = native.NativeTrainLoader(
        tiny_ds, batch_size=8, max_len=20, buckets=(5, 10), seed=0
    )
    try:
        for bucket, batch in _collect(loader, 30):
            assert bucket in (5, 10, 20)
            B, T = batch["inputs"].shape
            assert (B, T) == (8, bucket)
            m = batch["mask"].astype(bool)
            # Mask marks exactly the real transitions; pads are id 0.
            assert (batch["inputs"][m] > 0).all()
            assert (batch["targets"][m] > 0).all()
            assert (batch["inputs"][~m] == 0).all()
            assert (batch["targets"][~m] == 0).all()
            # Next-item alignment: targets are inputs shifted by one.
            for r in range(B):
                L = int(batch["mask"][r].sum())
                if L > 1:
                    np.testing.assert_array_equal(
                        batch["inputs"][r, 1:L], batch["targets"][r, :L - 1]
                    )
            # Rows fit their bucket: at least one row would not fit the
            # next-smaller bucket (bucketing is tight) — weak check: all
            # lengths <= bucket.
            lens = batch["mask"].sum(axis=1).astype(int)
            assert (lens <= bucket).all()
    finally:
        loader.close()


def test_rows_are_real_training_windows(tiny_ds):
    """Every emitted row must be a contiguous window of some user's
    train split (leave-last-out: last 2 items held out)."""
    train_seqs = {
        tuple(tiny_ds.train_seq(u).tolist()) for u in range(tiny_ds.num_users)
    }
    # Build the set of valid (input-seq) windows.
    valid = set()
    for s in train_seqs:
        s = list(s)
        w = s[-21:] if len(s) > 21 else s  # max_len=20 -> window 21 items
        if len(w) >= 2:
            valid.add(tuple(w))
    loader = native.NativeTrainLoader(
        tiny_ds, batch_size=4, max_len=20, seed=1
    )
    try:
        for bucket, batch in _collect(loader, 20):
            for r in range(4):
                L = int(batch["mask"][r].sum())
                row = tuple(
                    batch["inputs"][r, :L].tolist()
                    + [int(batch["targets"][r, L - 1])]
                )
                assert row in valid, row
    finally:
        loader.close()


def test_host_sharding_disjoint(tiny_ds):
    seen = []
    for shard in range(2):
        loader = native.NativeTrainLoader(
            tiny_ds, batch_size=4, max_len=30, seed=0, host_shard=(shard, 2)
        )
        rows = set()
        try:
            for _, batch in _collect(loader, 15):
                for r in range(4):
                    L = int(batch["mask"][r].sum())
                    rows.add(tuple(batch["inputs"][r, :L].tolist()))
        finally:
            loader.close()
        seen.append(rows)
    assert seen[0].isdisjoint(seen[1])


def test_epoch_coverage(tiny_ds):
    """Over enough batches the loader must visit (nearly) every user."""
    loader = native.NativeTrainLoader(
        tiny_ds, batch_size=4, max_len=30, seed=2
    )
    train_rows = {}
    for u in range(tiny_ds.num_users):
        s = tiny_ds.train_seq(u)
        w = s[-31:] if len(s) > 31 else s
        if len(w) >= 2:
            train_rows[tuple(w[:-1].tolist())] = u
    seen_users = set()
    try:
        for _, batch in _collect(loader, 120):
            for r in range(4):
                L = int(batch["mask"][r].sum())
                u = train_rows.get(tuple(batch["inputs"][r, :L].tolist()))
                if u is not None:
                    seen_users.add(u)
    finally:
        loader.close()
    assert len(seen_users) > 0.9 * tiny_ds.num_users
