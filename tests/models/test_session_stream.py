"""Session-parallel streaming: carry/reset semantics at tower level, the
stream-loss method, and an end-to-end trainer smoke run (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqrec_tpu.config import RunConfig
from seqrec_tpu.data.batching import make_session_stream
from seqrec_tpu.models.towers import RNNTower, zero_carry
from seqrec_tpu.train.trainer import Trainer


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_carry_splices_windows(cell, rng):
    """Encoding T steps in one call == two half-windows with carried state."""
    B, T, D = 3, 12, 16
    tower = RNNTower(hidden=D, num_layers=2, cell=cell, use_pallas=False)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    mask = jnp.ones((B, T), jnp.float32)
    params = tower.init(jax.random.key(0), x, mask)

    c0 = zero_carry(cell, 2, B, D)
    full, _ = tower.apply(params, x, mask, carry=c0,
                          reset=jnp.zeros((B, T), jnp.float32))
    h1, mid = tower.apply(params, x[:, : T // 2], mask[:, : T // 2],
                          carry=c0, reset=jnp.zeros((B, T // 2), jnp.float32))
    h2, _ = tower.apply(params, x[:, T // 2:], mask[:, T // 2:],
                        carry=mid, reset=jnp.zeros((B, T // 2), jnp.float32))
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([h1, h2], axis=1)), np.asarray(full),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_reset_equals_fresh_state(cell, rng):
    """A reset at position k makes positions k.. equal a fresh-state encode
    of the suffix, regardless of the carried state."""
    B, T, D = 2, 10, 16
    k = 4
    tower = RNNTower(hidden=D, num_layers=1, cell=cell, use_pallas=False)
    x = jnp.asarray(rng.normal(size=(B, T, D)), jnp.float32)
    mask = jnp.ones((B, T), jnp.float32)
    params = tower.init(jax.random.key(0), x, mask)

    dirty = jax.tree.map(
        lambda z: z + 3.0, zero_carry(cell, 1, B, D)
    )
    reset = jnp.zeros((B, T), jnp.float32).at[:, k].set(1.0)
    h, _ = tower.apply(params, x, mask, carry=dirty, reset=reset)
    fresh, _ = tower.apply(
        params, x[:, k:], mask[:, k:], carry=zero_carry(cell, 1, B, D),
        reset=jnp.zeros((B, T - k), jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(h[:, k:]), np.asarray(fresh), rtol=1e-5, atol=1e-5
    )
    # Non-vacuous: before k the dirty carry does change outputs.
    clean_full, _ = tower.apply(
        params, x, mask, carry=zero_carry(cell, 1, B, D),
        reset=jnp.zeros((B, T), jnp.float32),
    )
    assert not np.allclose(np.asarray(h[:, :k]), np.asarray(clean_full[:, :k]))


def test_session_stream_packs_densely(tiny_ds):
    """Windows are fully dense (mask all ones), resets mark exactly the
    session starts, and consecutive positions within a session chain
    input[t+1] == target[t]."""
    it = make_session_stream(tiny_ds, batch_size=4, window=16, seed=0)
    prev_tail = {}  # lane -> (last input, last target, ended?)
    for _ in range(12):
        w, b = next(it)
        assert w == 16
        assert (b["mask"] == 1.0).all()
        assert (b["inputs"] > 0).all() and (b["targets"] > 0).all()
        for r in range(4):
            ins, tgt, rst = b["inputs"][r], b["targets"][r], b["reset"][r]
            for t in range(15):
                if rst[t + 1] == 0.0:
                    # Same session continues: next input is this target.
                    assert ins[t + 1] == tgt[t]
            if r in prev_tail and rst[0] == 0.0:
                assert ins[0] == prev_tail[r]
            prev_tail[r] = tgt[15]


def test_session_stream_covers_all_pairs(tiny_ds):
    """One epoch of the stream emits every (input, target) training pair of
    every session at least once."""
    want = set()
    for u in range(tiny_ds.num_users):
        s = tiny_ds.train_seq(u)
        for i in range(len(s) - 1):
            want.add((int(s[i]), int(s[i + 1])))
    total_pairs = sum(
        max(len(tiny_ds.train_seq(u)) - 1, 0)
        for u in range(tiny_ds.num_users)
    )
    it = make_session_stream(tiny_ds, batch_size=4, window=16, seed=0)
    got = set()
    # 2 epochs of windows guarantees one full permutation cycle per lane.
    for _ in range(2 * (total_pairs // (4 * 16) + 1)):
        _, b = next(it)
        for r in range(4):
            for t in range(16):
                got.add((int(b["inputs"][r, t]), int(b["targets"][r, t])))
    assert want <= got


@pytest.mark.parametrize("loss", ["sampled_softmax", "bpr_max"])
def test_trainer_session_parallel(tiny_ds, loss):
    """End-to-end session-parallel training: loss falls, carry evolves."""
    cfg = RunConfig()
    cfg.model.embed_dim = 32
    cfg.model.loss = loss
    cfg.model.num_negatives = 32
    cfg.model.dropout_rate = 0.0
    cfg.data.batch_size = 8
    cfg.data.max_len = 16
    cfg.data.session_parallel = True
    cfg.train.out_dir = ""
    cfg.train.checkpoint_every = 0
    cfg.train.eval_every = 0
    tr = Trainer(cfg, ds=tiny_ds)
    state = tr.init_state()
    assert state.carry is not None
    it = tr.train_iterator()
    losses = []
    for _ in range(40):
        _, batch = next(it)
        state, metrics = tr._train_step(state, tr.put_batch(batch))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    # Carry is live state, not zeros.
    leaf = jax.tree_util.tree_leaves(state.carry)[0]
    assert float(jnp.abs(leaf).max()) > 0.0
