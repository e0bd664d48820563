"""Batch inference: ordering, history exclusion, padding, sharded path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqrec_tpu.config import ModelConfig, MeshConfig
from seqrec_tpu.eval.infer import recommend
from seqrec_tpu.models import build_model


def _setup(vocab=40, init_b=1, **kw):
    cfg = ModelConfig(arch="gru4rec", embed_dim=16, compute_dtype="float32",
                      use_pallas=False, dropout_rate=0.0)
    model = build_model(cfg, vocab, **kw)
    inputs = jnp.zeros((init_b, 8), jnp.int32)
    params = model.init(
        jax.random.key(0), inputs, jnp.ones((init_b, 8), jnp.float32)
    )
    return model, params


def test_topk_shape_and_exclusion():
    model, params = _setup()
    hist = [{"user": 1, "history": [3, 5, 7]},
            {"user": 2, "history": list(range(1, 20))}]
    outs = list(recommend(model, params, hist, k=5, batch_size=4, max_len=8))
    assert len(outs) == 2
    assert outs[0]["user"] == 1 and outs[1]["user"] == 2
    for out, h in zip(outs, hist):
        assert len(out["items"]) == 5
        # truncation keeps only the last 8 history items for exclusion, so
        # check against that window
        seen = set(h["history"][-8:])
        assert not (set(out["items"]) & seen)
        assert 0 not in out["items"]  # pad never recommended
        # Scores sorted descending.
        assert out["scores"] == sorted(out["scores"], reverse=True)


def test_allow_repeats():
    model, params = _setup()
    hist = [{"history": [3, 5, 7]}]
    out_ex = list(recommend(model, params, hist, k=39, batch_size=1,
                            max_len=8, exclude_history=False))[0]
    # With exclusion off and k = full catalog, everything real appears.
    assert len(out_ex["items"]) == 39
    assert set(out_ex["items"]) == set(range(1, 40))


def test_multiple_batches_preserve_order():
    model, params = _setup()
    hist = [{"user": i, "history": [1 + (i % 5)]} for i in range(10)]
    outs = list(recommend(model, params, hist, k=3, batch_size=4, max_len=8))
    assert [o["user"] for o in outs] == list(range(10))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 fake devices")
def test_sharded_topk_path_matches_dense():
    from seqrec_tpu.runtime import make_mesh

    mesh = make_mesh(2)
    # vocab 48 = its own padded size for 2 shards, so the sharded and dense
    # models draw identical parameter shapes (hence identical weights).
    model_s, params_s = _setup(
        vocab=48, init_b=8,
        mesh=mesh, mesh_cfg=MeshConfig(model_axis=2, shard_embeddings=True),
    )
    model_d, params_d = _setup(vocab=48)
    assert model_s.table_size == model_d.vocab_size
    hist = [{"user": 0, "history": [2, 4, 6]}]
    out_s = list(recommend(model_s, params_s, hist, k=5, batch_size=8,
                           max_len=8, mesh=mesh))[0]
    out_d = list(recommend(model_d, params_d, hist, k=5, batch_size=8,
                           max_len=8))[0]
    assert out_s["items"] == out_d["items"]
    np.testing.assert_allclose(out_s["scores"], out_d["scores"], rtol=1e-5)
