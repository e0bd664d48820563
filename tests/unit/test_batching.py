"""Bucketing / padding / mask invariants (SURVEY.md §4 unit tier)."""

import numpy as np

from seqrec_tpu.data.batching import (
    BucketBatcher,
    make_eval_batches,
    make_train_batches,
)
from seqrec_tpu.data.dataset import synthetic_dataset


def test_bucket_selection_and_shapes():
    b = BucketBatcher(batch_size=2, max_len=100, buckets=(10, 50))
    assert b.buckets == (10, 50, 100)
    out = b.add(np.arange(1, 8))  # len 7 -> 6 steps -> bucket 10
    assert out is None
    bucket, batch = b.add(np.arange(1, 6))
    assert bucket == 10
    assert batch["inputs"].shape == (2, 10)
    assert batch["targets"].shape == (2, 10)
    assert batch["mask"].shape == (2, 10)


def test_next_item_alignment_and_mask():
    b = BucketBatcher(batch_size=1, max_len=10)
    seq = np.array([3, 1, 4, 1, 5])
    bucket, batch = b.add(seq)
    np.testing.assert_array_equal(batch["inputs"][0, :4], [3, 1, 4, 1])
    np.testing.assert_array_equal(batch["targets"][0, :4], [1, 4, 1, 5])
    np.testing.assert_array_equal(batch["mask"][0], [1, 1, 1, 1] + [0] * 6)
    # Pad positions are id 0.
    assert (batch["inputs"][0, 4:] == 0).all()


def test_truncation_keeps_most_recent():
    # max_len=3 steps -> keep last 4 items: [8,7,6,5].
    b = BucketBatcher(batch_size=1, max_len=3)
    _, batch = b.add(np.array([9, 8, 7, 6, 5]))
    np.testing.assert_array_equal(batch["inputs"][0], [8, 7, 6])
    np.testing.assert_array_equal(batch["targets"][0], [7, 6, 5])
    assert batch["mask"][0].sum() == 3


def test_mask_never_counts_pad():
    ds = synthetic_dataset(50, 30, seed=1)
    for i, (bucket, batch) in enumerate(
        make_train_batches(ds, batch_size=8, max_len=20, buckets=(5, 10), seed=0,
                           num_epochs=1)
    ):
        m = batch["mask"].astype(bool)
        assert (batch["inputs"][m] > 0).all()
        assert (batch["targets"][m] > 0).all()
        assert (batch["targets"][~m] == 0).all()
        if i > 20:
            break


def test_host_sharding_disjoint():
    ds = synthetic_dataset(40, 30, seed=2)
    seen = []
    for shard in range(2):
        users = set()
        for _, batch in make_train_batches(
            ds, batch_size=4, max_len=40, seed=0, num_epochs=1,
            host_shard=(shard, 2),
        ):
            for row in batch["inputs"]:
                users.add(tuple(row[row > 0].tolist()))
        seen.append(users)
    assert seen[0].isdisjoint(seen[1])


def test_eval_batches_layout():
    ds = synthetic_dataset(30, 30, seed=3)
    batches = list(make_eval_batches(ds, split="test", batch_size=8, max_len=15))
    total = sum(int(b["valid"].sum()) for b in batches)
    expected = sum(1 for u in range(ds.num_users) if len(ds.seq(u)) >= 3)
    assert total == expected
    for b in batches:
        for r in range(len(b["target"])):
            if b["valid"][r]:
                assert b["target"][r] > 0
                L = int(b["mask"][r].sum())
                assert (b["inputs"][r, :L] > 0).all()
                assert (b["inputs"][r, L:] == 0).all()
