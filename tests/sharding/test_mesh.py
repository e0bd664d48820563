"""Mesh construction + sharded-trainer smoke on fake devices."""

import jax
import numpy as np
import pytest

from seqrec_tpu.config import RunConfig
from seqrec_tpu.runtime import make_mesh

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 fake devices"
)


def test_make_mesh_shapes():
    m = make_mesh(2)
    assert m.shape == {"data": 4, "model": 2}
    m = make_mesh(1)
    assert m.shape == {"data": 8, "model": 1}
    with pytest.raises(ValueError):
        make_mesh(3)  # does not divide 8


def test_dp_trainer_runs_on_mesh(tiny_ds, tmp_path):
    """Pure-DP training across 8 fake devices produces finite loss."""
    from seqrec_tpu.train.trainer import Trainer

    cfg = RunConfig()
    cfg.model.embed_dim = 16
    cfg.model.use_pallas = False
    cfg.model.compute_dtype = "float32"
    cfg.data.batch_size = 2  # per-device -> global 16
    cfg.data.max_len = 10
    cfg.train.num_steps = 3
    cfg.train.log_every = 100
    cfg.train.eval_every = 0
    cfg.train.checkpoint_every = 0
    cfg.train.out_dir = str(tmp_path / "dp")
    tr = Trainer(cfg, ds=tiny_ds)
    state, _ = tr.fit()
    assert int(jax.device_get(state.step)) == 3


def test_session_parallel_trainer_on_mesh(tiny_ds, tmp_path):
    """Session-parallel streaming across DP x TP(2): the carried RNN state
    shards like batch rows and training proceeds."""
    from seqrec_tpu.train.trainer import Trainer

    cfg = RunConfig()
    cfg.model.embed_dim = 16
    cfg.model.use_pallas = False
    cfg.model.compute_dtype = "float32"
    cfg.model.loss = "sampled_softmax"
    cfg.model.num_negatives = 16
    cfg.data.batch_size = 2
    cfg.data.max_len = 10
    cfg.data.session_parallel = True
    cfg.train.num_steps = 3
    cfg.train.log_every = 100
    cfg.train.eval_every = 0
    cfg.train.checkpoint_every = 0
    cfg.train.out_dir = str(tmp_path / "sp")
    cfg.mesh.model_axis = 2
    cfg.mesh.shard_embeddings = True
    tr = Trainer(cfg, ds=tiny_ds)
    state, _ = tr.fit()
    assert int(jax.device_get(state.step)) == 3
    carry0 = state.carry[0]
    assert carry0.shape == (16, 16)  # (global batch, hidden)
    assert "data" in jax.tree_util.tree_leaves(carry0.sharding.spec)[0] or \
        carry0.sharding.spec[0] == ("data", "model")


def test_sharded_embedding_trainer(tiny_ds, tmp_path):
    """DP x TP(2) with row-sharded tables trains and matches replicated
    single-step loss closely."""
    from seqrec_tpu.train.trainer import Trainer

    cfg = RunConfig()
    cfg.model.embed_dim = 16
    cfg.model.use_pallas = False
    cfg.model.compute_dtype = "float32"
    cfg.data.batch_size = 2
    cfg.data.max_len = 10
    cfg.train.num_steps = 3
    cfg.train.log_every = 100
    cfg.train.eval_every = 0
    cfg.train.checkpoint_every = 0
    cfg.train.out_dir = str(tmp_path / "tp")
    cfg.mesh.model_axis = 2
    cfg.mesh.shard_embeddings = True
    tr = Trainer(cfg, ds=tiny_ds)
    state, _ = tr.fit()
    assert int(jax.device_get(state.step)) == 3
    # The item table really is row-sharded over 'model'.
    emb = state.params["params"]["item_embedding"]
    spec = emb.sharding.spec
    assert spec[0] == "model"


def test_sparse_embed_trainer_runs_on_dp_mesh(tiny_ds, tmp_path):
    """Sparse embedding updates under pure DP: the global-batch unique /
    remap / scatter must compile and run with batches sharded over 8 fake
    devices (XLA gathers the ids for the global unique), and match the
    single-device sparse run's loss on the same global batch stream."""
    from seqrec_tpu.train.trainer import Trainer

    def run(mesh_devices):
        cfg = RunConfig()
        cfg.model.embed_dim = 16
        cfg.model.use_pallas = False
        cfg.model.compute_dtype = "float32"
        cfg.model.loss = "sampled_softmax"
        cfg.model.num_negatives = 16
        cfg.model.dropout_rate = 0.0
        cfg.data.batch_size = 16 // mesh_devices  # global 16 either way
        cfg.data.max_len = 10
        cfg.train.num_steps = 3
        cfg.train.log_every = 100
        cfg.train.eval_every = 0
        cfg.train.checkpoint_every = 0
        cfg.train.optimizer = "adagrad"
        cfg.train.sparse_embedding_update = True
        cfg.train.out_dir = str(tmp_path / f"sp{mesh_devices}")
        mesh = make_mesh(1, devices=jax.devices()[:mesh_devices])
        tr = Trainer(cfg, ds=tiny_ds, mesh=mesh)
        state = tr.init_state()
        losses = []
        it = tr.train_iterator()
        for _ in range(3):
            _, batch = next(it)
            state, m = tr._train_step(state, tr.put_batch(batch))
            losses.append(float(m["loss"]))
        return losses

    l8 = run(8)
    l1 = run(1)
    assert all(np.isfinite(l8))
    np.testing.assert_allclose(l8, l1, rtol=1e-4)
