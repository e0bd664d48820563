"""Capped sparse unique budget (train.sparse_unique_budget): ids past the
budget must degrade SAFELY — embed as the zeros sentinel, update nothing —
never corrupt a neighboring id's row (the failure mode of naive
searchsorted remapping under truncation). cap >= the exact budget must be
bit-identical to uncapped."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqrec_tpu.config import RunConfig
from seqrec_tpu.data.dataset import synthetic_dataset
from seqrec_tpu.train import sparse_embed
from seqrec_tpu.train.trainer import Trainer


def _cfg(budget=0, optimizer="adagrad"):
    cfg = RunConfig()
    cfg.model.embed_dim = 16
    cfg.model.max_len = 10
    cfg.model.loss = "sampled_softmax"
    cfg.model.num_negatives = 32
    cfg.model.dropout_rate = 0.0
    cfg.model.use_pallas = False
    cfg.model.compute_dtype = "float32"
    cfg.data.batch_size = 8
    cfg.data.max_len = 10
    cfg.data.synthetic_num_items = 500
    cfg.train.optimizer = optimizer
    cfg.train.sparse_embedding_update = True
    cfg.train.sparse_unique_budget = budget
    cfg.train.out_dir = ""
    cfg.train.checkpoint_every = 0
    cfg.train.eval_every = 0
    return cfg


def _ds():
    return synthetic_dataset(num_users=128, num_items=500, seed=0,
                             min_len=4, max_len=11)


def test_remap_capped_overflow_goes_to_sentinel():
    uids = jnp.asarray([0, 0, 3, 7, 9], jnp.int32)  # fill dups at front
    ids = jnp.asarray([0, 3, 7, 9, 4, 8, 11], jnp.int32)
    got = np.asarray(sparse_embed.remap_capped(uids, ids))
    np.testing.assert_array_equal(got[:4], [0, 2, 3, 4])  # members found
    # 4, 8, 11 are NOT in uids: all must hit the sentinel K=5, never a
    # neighbor (plain searchsorted would return 2, 4, 5 - wrong rows).
    np.testing.assert_array_equal(got[4:], [5, 5, 5])


def test_large_cap_is_bitwise_exact():
    ds = _ds()
    tr_a = Trainer(_cfg(budget=0), ds=ds)
    tr_b = Trainer(_cfg(budget=10_000), ds=ds)  # >= exact budget
    sa, sb = tr_a.init_state(), tr_b.init_state()
    ita, itb = tr_a.train_iterator(), tr_b.train_iterator()
    for _ in range(3):
        _, ba = next(ita)
        _, bb = next(itb)
        sa, ma = tr_a._train_step(sa, tr_a.put_batch(ba))
        sb, mb = tr_b._train_step(sb, tr_b.put_batch(bb))
    np.testing.assert_array_equal(
        np.asarray(sa.params["params"]["item_embedding"]),
        np.asarray(sb.params["params"]["item_embedding"]),
    )
    assert float(ma["loss"]) == float(mb["loss"])


def test_tiny_cap_never_touches_rows_outside_unique_set():
    """With a cap far below the batch's distinct-id count, updated rows
    must be a subset of the capped unique set; every other row (including
    the overflowed ids' rows) stays bit-identical."""
    ds = _ds()
    cap = 16
    tr = Trainer(_cfg(budget=cap), ds=ds)
    state = tr.init_state()
    table_before = np.asarray(state.params["params"]["item_embedding"]).copy()
    _, batch = next(tr.train_iterator())
    state2, m = tr._train_step(state, tr.put_batch(batch))
    assert np.isfinite(float(m["loss"]))
    table_after = np.asarray(state2.params["params"]["item_embedding"])
    changed = np.flatnonzero(np.any(table_after != table_before, axis=1))
    assert len(changed) <= cap, (len(changed), cap)


def test_moderate_cap_still_learns():
    # Same setup as test_sparse_embed's known-learning adam config
    # (200-item vocab), capped to 64 of the exact 192-id budget — real
    # overflow every step. jnp.unique's truncation keeps the SMALLEST ids,
    # and the vocab is frequency-ordered (1 = most popular), so overflow
    # sheds the rare tail first — the right degradation direction for a
    # recommender.
    cfg = _cfg(budget=32, optimizer="adam")
    cfg.data.synthetic_num_items = 200
    ds = synthetic_dataset(num_users=64, num_items=200, seed=0, min_len=4,
                           max_len=11)
    tr = Trainer(cfg, ds=ds)
    state = tr.init_state()
    it = tr.train_iterator()
    losses = []
    for _ in range(80):
        _, b = next(it)
        state, m = tr._train_step(state, tr.put_batch(b))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    # Sampled-softmax per-step noise swamps short windows; over 80 steps the
    # capped run must still make clear progress (calibrated CPU curve:
    # mean first-5 4.49 -> mean last-10 4.18; a ~32-of-60-unique cap is
    # heavy overflow, so slower than exact is expected, stalled is not).
    assert np.mean(losses[-10:]) < np.mean(losses[:5]) - 0.1


def test_cap_composes_with_session_and_sharded(tiny_ds):
    """cap x session-parallel x row-sharded table: one step runs, table
    keeps its sharding, changed rows bounded by the cap."""
    cfg = _cfg(budget=32)
    cfg.data.session_parallel = True
    cfg.data.neg_sampler = "uniform"
    cfg.data.max_len = 12
    cfg.model.max_len = 12
    cfg.mesh.model_axis = 2
    cfg.mesh.shard_embeddings = True
    tr = Trainer(cfg, ds=tiny_ds)
    state = tr.init_state()
    _, batch = next(tr.train_iterator())
    new_state, m = tr._train_step(state, tr.put_batch(batch))
    assert np.isfinite(float(m["loss"]))
    emb = new_state.params["params"]["item_embedding"]
    assert emb.sharding.spec[0] == "model"
