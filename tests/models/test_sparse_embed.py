"""Sparse (row-wise) embedding updates vs. the dense path (SURVEY.md §2 #21;
train/sparse_embed.py). For sgd/adagrad the two must produce the SAME
training trajectory — the sparse step is a reparameterization, not an
approximation. Adam is lazy (documented) and only smoke-tested."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqrec_tpu.config import RunConfig
from seqrec_tpu.data.dataset import synthetic_dataset
from seqrec_tpu.train import sparse_embed
from seqrec_tpu.train.trainer import Trainer


def _cfg(optimizer="adagrad", loss="sampled_softmax"):
    cfg = RunConfig()
    cfg.model.arch = "gru4rec"
    cfg.model.embed_dim = 16
    cfg.model.num_layers = 1
    cfg.model.max_len = 10
    cfg.model.loss = loss
    cfg.model.num_negatives = 32
    cfg.model.dropout_rate = 0.0
    cfg.model.use_pallas = False
    cfg.model.compute_dtype = "float32"  # exact-parity comparison
    cfg.data.batch_size = 8
    cfg.data.max_len = 10
    cfg.data.synthetic_num_items = 200
    cfg.train.optimizer = optimizer
    cfg.train.out_dir = ""
    cfg.train.checkpoint_every = 0
    cfg.train.eval_every = 0
    return cfg


def _train(cfg, steps=4):
    ds = synthetic_dataset(num_users=64, num_items=200, seed=0, min_len=4,
                           max_len=11)
    tr = Trainer(cfg, ds=ds)
    state = tr.init_state()
    it = tr.train_iterator()
    losses = []
    for i in range(steps):
        _, batch = next(it)
        state, m = tr._train_step(state, tr.put_batch(batch))
        losses.append(float(m["loss"]))
    return state, losses


@pytest.mark.parametrize("optimizer", ["sgd", "adagrad"])
def test_sparse_matches_dense_trajectory(optimizer):
    dense_state, dense_losses = _train(_cfg(optimizer))
    cfg = _cfg(optimizer)
    cfg.train.sparse_embedding_update = True
    sparse_state, sparse_losses = _train(cfg)

    np.testing.assert_allclose(sparse_losses, dense_losses, rtol=1e-5)
    d = dense_state.params["params"]
    s = sparse_state.params["params"]
    np.testing.assert_allclose(
        np.asarray(s["item_embedding"]), np.asarray(d["item_embedding"]),
        rtol=2e-5, atol=2e-6, err_msg="item table diverged",
    )
    for k in d:
        if k == "item_embedding":
            continue
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6),
            s[k], d[k],
        )


@pytest.mark.parametrize("loss", ["bpr", "top1"])
def test_sparse_other_sampled_losses_run(loss):
    cfg = _cfg("adagrad", loss=loss)
    cfg.train.sparse_embedding_update = True
    _, losses = _train(cfg, steps=3)
    assert all(np.isfinite(losses))


def test_sparse_adam_lazy_runs_and_learns():
    cfg = _cfg("adam")
    cfg.train.sparse_embedding_update = True
    _, losses = _train(cfg, steps=8)
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_sparse_rejects_full_softmax():
    cfg = _cfg("adagrad", loss="full_softmax")
    cfg.train.sparse_embedding_update = True
    ds = synthetic_dataset(num_users=64, num_items=200, seed=0, min_len=4,
                           max_len=11)
    with pytest.raises(ValueError, match="full table every step"):
        Trainer(cfg, ds=ds)


def test_row_update_duplicate_fill_is_harmless():
    """unique()'s fill duplicates must contribute exactly zero."""
    table = jnp.ones((10, 4))
    opt = sparse_embed.init_row_opt("adagrad", table)
    # uids sorted with duplicates of id 0 (the fill pattern).
    uids = jnp.array([0, 0, 0, 3, 7], jnp.int32)
    g = jnp.ones((5, 4))
    new_table, new_opt = sparse_embed.row_update(
        "adagrad", jnp.float32(0.1), table, opt, uids, g, jnp.int32(0))
    # Rows 0, 3, 7 each updated ONCE with g=1; rows 1,2 untouched.
    expected_delta = -0.1 * 1.0 / np.sqrt(0.1 + 1.0 + sparse_embed.ADAGRAD_EPS)
    got = np.asarray(new_table - table)
    np.testing.assert_allclose(got[0], expected_delta, rtol=1e-6)
    np.testing.assert_allclose(got[3], expected_delta, rtol=1e-6)
    np.testing.assert_allclose(got[7], expected_delta, rtol=1e-6)
    assert np.all(got[[1, 2, 4, 5, 6, 8, 9]] == 0.0)
    acc = np.asarray(new_opt["acc"])
    np.testing.assert_allclose(acc[0], 1.1, rtol=1e-6)
    assert np.all(acc[1] == 0.1)


def test_remap_leftmost_on_duplicates():
    uids = jnp.array([0, 0, 2, 5], jnp.int32)
    ids = jnp.array([5, 0, 2], jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(sparse_embed.remap(uids, ids)), [3, 0, 2])


def test_sparse_untied_matches_dense_trajectory():
    """Untied output table: separate unique/remap/sub-table per table, still
    exact vs dense for adagrad."""
    def cfg_untied():
        cfg = _cfg("adagrad")
        cfg.model.tie_embeddings = False
        return cfg

    dense_state, dense_losses = _train(cfg_untied())
    cfg = cfg_untied()
    cfg.train.sparse_embedding_update = True
    sparse_state, sparse_losses = _train(cfg)

    np.testing.assert_allclose(sparse_losses, dense_losses, rtol=1e-5)
    d = dense_state.params["params"]
    s = sparse_state.params["params"]
    for name in ("item_embedding", "output_embedding"):
        np.testing.assert_allclose(
            np.asarray(s[name]), np.asarray(d[name]),
            rtol=2e-5, atol=2e-6, err_msg=f"{name} diverged",
        )
