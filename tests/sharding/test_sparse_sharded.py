"""Sparse (row-wise) updates × row-sharded tables — the flagship
large-catalog composition (BASELINE.json:11: 10M items row-sharded across
hosts, no dense [V, D] gradient; train/sparse_embed.py "row-sharded
composition" section).

Fake 8-device mesh (SURVEY.md §4 sharding tier). adagrad sparse updates are
EXACT vs dense, so the sharded composition must reproduce the dense-sharded
trajectory bitwise-close; it must also match the unsharded sparse trajectory
when the table needs no shard padding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqrec_tpu.config import RunConfig
from seqrec_tpu.data.dataset import synthetic_dataset
from seqrec_tpu.runtime import make_mesh
from seqrec_tpu.train import sparse_embed
from seqrec_tpu.train.trainer import Trainer

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 fake devices"
)


def _cfg(tmp_path, tag, *, optimizer="adagrad", sparse=True, shard=True,
         model_axis=2, global_batch=16, tie=True):
    cfg = RunConfig()
    cfg.model.embed_dim = 16
    cfg.model.num_layers = 1
    cfg.model.max_len = 10
    cfg.model.loss = "sampled_softmax"
    cfg.model.num_negatives = 16
    cfg.model.dropout_rate = 0.0
    cfg.model.use_pallas = False
    cfg.model.compute_dtype = "float32"  # exact-parity comparison
    cfg.model.tie_embeddings = tie
    cfg.data.batch_size = max(global_batch // 8, 1)
    cfg.data.max_len = 10
    cfg.train.optimizer = optimizer
    cfg.train.sparse_embedding_update = sparse
    cfg.train.out_dir = str(tmp_path / tag)
    cfg.train.checkpoint_every = 0
    cfg.train.eval_every = 0
    cfg.mesh.model_axis = model_axis
    cfg.mesh.shard_embeddings = shard
    return cfg


# 63 items -> vocab 64: padded_vocab(64, 2) == padded_vocab(64, 4) == 64, so
# sharded and unsharded models draw IDENTICAL init params (same table shape).
@pytest.fixture(scope="module")
def ds64():
    return synthetic_dataset(num_users=64, num_items=63, seed=0, min_len=4,
                             max_len=11)


def _train(cfg, ds, mesh=None, steps=4):
    tr = Trainer(cfg, ds=ds, mesh=mesh)
    state = tr.init_state()
    it = tr.train_iterator()
    losses = []
    for _ in range(steps):
        _, batch = next(it)
        state, m = tr._train_step(state, tr.put_batch(batch))
        losses.append(float(m["loss"]))
    return state, losses


@pytest.mark.parametrize("model_axis", [2, 4])
def test_sparse_sharded_matches_dense_sharded(ds64, tmp_path, model_axis):
    """adagrad: sparse scatter-update on the row-sharded table == the dense
    sharded path's optax trajectory (same mesh, same padded table)."""
    dense_state, dense_losses = _train(
        _cfg(tmp_path, "dense", sparse=False, model_axis=model_axis), ds64)
    sparse_state, sparse_losses = _train(
        _cfg(tmp_path, "sparse", sparse=True, model_axis=model_axis), ds64)

    np.testing.assert_allclose(sparse_losses, dense_losses, rtol=1e-5)
    d = dense_state.params["params"]
    s = sparse_state.params["params"]
    emb = s["item_embedding"]
    assert emb.sharding.spec[0] == "model", "table lost its row sharding"
    np.testing.assert_allclose(
        np.asarray(s["item_embedding"]), np.asarray(d["item_embedding"]),
        rtol=2e-5, atol=2e-6, err_msg="item table diverged",
    )


def test_sparse_sharded_matches_sparse_unsharded(ds64, tmp_path):
    """Same sparse semantics with and without the model-axis sharding."""
    sh_state, sh_losses = _train(
        _cfg(tmp_path, "sh", sparse=True, model_axis=2), ds64)
    cfg1 = _cfg(tmp_path, "unsh", sparse=True, shard=False, model_axis=1,
                global_batch=16)
    cfg1.data.batch_size = 16
    mesh1 = make_mesh(1, devices=jax.devices()[:1])
    un_state, un_losses = _train(cfg1, ds64, mesh=mesh1)

    np.testing.assert_allclose(sh_losses, un_losses, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sh_state.params["params"]["item_embedding"]),
        np.asarray(un_state.params["params"]["item_embedding"]),
        rtol=2e-5, atol=2e-6,
    )
    # Row-wise optimizer state is itself row-sharded (the point of the
    # composition: no replicated [V, D] moments).
    acc = sh_state.embed_opt["item_embedding"]["acc"]
    assert acc.sharding.spec[0] == "model"
    np.testing.assert_allclose(
        np.asarray(acc),
        np.asarray(un_state.embed_opt["item_embedding"]["acc"]),
        rtol=2e-5, atol=2e-6,
    )


def test_sparse_sharded_untied_adam_runs_and_learns(ds64, tmp_path):
    """Untied output table + lazy adam on the sharded path: finite and
    decreasing (adam is documented-lazy, not exact — smoke only)."""
    cfg = _cfg(tmp_path, "untied", optimizer="adam", tie=False)
    _, losses = _train(cfg, ds64, steps=8)
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


# ---- unit parity for the two shard_map pieces ------------------------------


@pytest.mark.parametrize("model_axis", [2, 4, 8])
def test_sharded_sub_table_matches_take(model_axis):
    mesh = make_mesh(model_axis)
    rng = np.random.default_rng(model_axis)
    table = jnp.asarray(rng.normal(size=(64, 8)), jnp.float32)
    uids = jnp.sort(jnp.asarray(
        rng.choice(64, size=24, replace=False), jnp.int32))

    got = sparse_embed.sharded_sub_table(table, uids, mesh)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(table[uids]), rtol=1e-6)


@pytest.mark.parametrize("optimizer", ["sgd", "adagrad", "adam"])
def test_sharded_row_update_matches_unsharded(optimizer):
    """Each row updated exactly once on its owning shard — including adam,
    whose moment delta is nonzero even at g=0 (the ownership mask, not
    g-zeroing, is what protects foreign rows)."""
    mesh = make_mesh(4)
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(32, 4)), jnp.float32)
    opt = sparse_embed.init_row_opt(optimizer, table)
    if optimizer == "adam":  # non-trivial moments: lazy-adam state matters
        opt = jax.tree.map(
            lambda x: jnp.asarray(rng.normal(size=x.shape) ** 2, jnp.float32),
            opt,
        )
    # Sorted unique ids with duplicate-fill at the front (collect_unique
    # layout) spanning several shards.
    uids = jnp.asarray([0, 0, 3, 7, 8, 15, 16, 29, 31], jnp.int32)
    g = jnp.asarray(rng.normal(size=(9, 4)), jnp.float32)
    lr = jnp.float32(0.05)
    step = jnp.int32(3)

    want_t, want_o = sparse_embed.row_update(
        optimizer, lr, table, opt, uids, g, step)
    got_t, got_o = sparse_embed.sharded_row_update(
        optimizer, lr, table, opt, uids, g, step, mesh)

    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t),
                               rtol=1e-6, atol=1e-7)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        got_o, want_o,
    )
