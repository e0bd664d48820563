"""Dataset prep: vocab mapping, splits, k-core, persistence."""

import numpy as np

from seqrec_tpu.data.dataset import (
    SequenceDataset,
    from_interactions,
    synthetic_dataset,
)


def test_frequency_ordered_vocab():
    users = [1, 1, 1, 2, 2, 3]
    items = ["b", "a", "c", "a", "b", "a"]  # a:3, b:2, c:1
    ts = [1, 2, 3, 1, 2, 1]
    ds = from_interactions(users, items, ts, min_seq_len=1)
    assert ds.vocab_size == 4  # 3 items + pad
    # User 1 in time order: b,a,c -> ids 2,1,3 (a=1 most frequent).
    np.testing.assert_array_equal(ds.seq(0), [2, 1, 3])


def test_chronological_order_with_stable_ties():
    ds = from_interactions([1, 1, 1], ["x", "y", "z"], [5, 3, 5], min_seq_len=1)
    # ts order: y(3), then x,z tie at 5 kept in file order.
    names_in_order = ["y", "x", "z"]
    # All items have count 1; stable frequency sort keeps first-seen order x,y,z -> ids 1,2,3.
    id_of = {"x": 1, "y": 2, "z": 3}
    np.testing.assert_array_equal(ds.seq(0), [id_of[n] for n in names_in_order])


def test_leave_last_out_split():
    ds = from_interactions(
        [1] * 5, list("abcde"), range(5), min_seq_len=2
    )
    s = ds.seq(0)
    np.testing.assert_array_equal(ds.train_seq(0), s[:-2])
    val = ds.eval_example(0, "val")
    test = ds.eval_example(0, "test")
    np.testing.assert_array_equal(val["history"], s[:-2])
    assert val["target"] == s[-2]
    np.testing.assert_array_equal(test["history"], s[:-1])
    assert test["target"] == s[-1]


def test_short_users_skipped_in_eval():
    ds = from_interactions([1, 1], ["a", "b"], [0, 1], min_seq_len=2)
    assert ds.eval_example(0, "test") is None
    assert len(ds.train_seq(0)) == 1  # trains on what it has


def test_kcore_filtering():
    # item "rare" appears once; users 3 interacts only with rare.
    users = [1, 1, 1, 2, 2, 2, 3]
    items = ["a", "b", "c", "a", "b", "c", "rare"]
    ts = list(range(7))
    ds = from_interactions(users, items, ts, min_seq_len=2, min_item_count=2)
    assert ds.num_users == 2
    assert ds.vocab_size == 4  # a,b,c + pad


def test_save_load_round_trip(tmp_path):
    ds = synthetic_dataset(20, 15, seed=5)
    ds.save(str(tmp_path / "d"))
    ds2 = SequenceDataset.load(str(tmp_path / "d"))
    np.testing.assert_array_equal(ds.items, ds2.items)
    np.testing.assert_array_equal(ds.offsets, ds2.offsets)
    assert ds.vocab_size == ds2.vocab_size


def test_synthetic_ids_in_range(tiny_ds):
    assert tiny_ds.items.min() >= 1
    assert tiny_ds.items.max() < tiny_ds.vocab_size
