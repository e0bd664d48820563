"""User-embedding personalization: param creation, effect on outputs,
end-to-end training, and sharded user table."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqrec_tpu.config import ModelConfig, RunConfig
from seqrec_tpu.models import build_model


def _model(**kw):
    cfg = ModelConfig(arch="gru4rec", embed_dim=32, compute_dtype="float32",
                      use_pallas=False, dropout_rate=0.0,
                      use_user_embedding=True, **kw)
    return build_model(cfg, vocab_size=50, num_users=20)


def test_param_created_and_used(rng):
    model = _model()
    inputs = jnp.asarray(rng.integers(1, 50, size=(4, 8)), jnp.int32)
    mask = jnp.ones((4, 8), jnp.float32)
    params = model.init(jax.random.key(0), inputs, mask)
    assert params["params"]["user_embedding"].shape == (21, 32)

    users_a = jnp.asarray([1, 2, 3, 4], jnp.int32)
    users_b = jnp.asarray([5, 6, 7, 8], jnp.int32)
    h_a = model.apply(params, inputs, mask, users=users_a)
    h_b = model.apply(params, inputs, mask, users=users_b)
    # Different users => different encodings (personalization is live).
    assert not np.allclose(np.asarray(h_a), np.asarray(h_b))
    # No users => unpersonalized path still works.
    h_none = model.apply(params, inputs, mask)
    assert np.isfinite(np.asarray(h_none)).all()


def test_scores_vary_by_user(rng):
    model = _model()
    inputs = jnp.asarray(rng.integers(1, 50, size=(2, 8)), jnp.int32)
    mask = jnp.ones((2, 8), jnp.float32)
    params = model.init(jax.random.key(1), inputs, mask)
    s1 = model.apply(params, inputs, mask, users=jnp.asarray([1, 2]),
                     method=model.scores)
    s2 = model.apply(params, inputs, mask, users=jnp.asarray([3, 4]),
                     method=model.scores)
    assert not np.allclose(np.asarray(s1), np.asarray(s2))


def test_trains_end_to_end(tiny_ds, tmp_path):
    from seqrec_tpu.train.trainer import Trainer

    cfg = RunConfig()
    cfg.model.embed_dim = 16
    cfg.model.use_pallas = False
    cfg.model.compute_dtype = "float32"
    cfg.model.use_user_embedding = True
    cfg.data.batch_size = 16
    cfg.data.max_len = 10
    cfg.train.num_steps = 5
    cfg.train.eval_every = 0
    cfg.train.checkpoint_every = 0
    cfg.train.log_every = 100
    cfg.train.out_dir = str(tmp_path / "u")
    tr = Trainer(cfg, ds=tiny_ds)
    state, _ = tr.fit()
    m = tr.evaluate(state, split="test")
    assert m["count"] == 100.0
    # User table received gradient updates (not still at init).
    emb = np.asarray(state.params["params"]["user_embedding"])
    assert np.abs(emb).sum() > 0


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 fake devices")
def test_sharded_user_table(tiny_ds, tmp_path):
    from seqrec_tpu.train.trainer import Trainer

    cfg = RunConfig()
    cfg.model.embed_dim = 16
    cfg.model.use_pallas = False
    cfg.model.compute_dtype = "float32"
    cfg.model.use_user_embedding = True
    cfg.data.batch_size = 2
    cfg.data.max_len = 10
    cfg.train.num_steps = 2
    cfg.train.eval_every = 0
    cfg.train.checkpoint_every = 0
    cfg.train.log_every = 100
    cfg.train.out_dir = str(tmp_path / "us")
    cfg.mesh.model_axis = 2
    cfg.mesh.shard_embeddings = True
    tr = Trainer(cfg, ds=tiny_ds)
    state, _ = tr.fit()
    uemb = state.params["params"]["user_embedding"]
    assert uemb.sharding.spec[0] == "model"
