"""Row-sharded embedding lookup parity on a fake 8-device mesh
(SURVEY.md §4 sharding tier; §7.3 item 1 — the subtlest correctness surface).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqrec_tpu.parallel.embedding import padded_vocab, sharded_gather
from seqrec_tpu.runtime import make_mesh
from seqrec_tpu.runtime.mesh import MODEL_AXIS


pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 fake devices"
)


@pytest.mark.parametrize("model_shards", [2, 4, 8])
@pytest.mark.parametrize("dedup", [True, False])
def test_lookup_matches_dense(model_shards, dedup):
    mesh = make_mesh(model_shards)
    V = padded_vocab(100, model_shards)
    D = 16
    rng = np.random.default_rng(model_shards)
    table = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 100, size=(16, 6)), jnp.int32)

    got = sharded_gather(table, ids, mesh, dedup=dedup)
    want = jnp.take(table, ids, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


@pytest.mark.parametrize("model_shards", [2, 4])
def test_gradient_matches_dense(model_shards):
    """Backward through the collective lookup == dense scatter-add."""
    mesh = make_mesh(model_shards)
    V = padded_vocab(64, model_shards)
    D = 8
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, 64, size=(8, 4)), jnp.int32)
    # Duplicate ids on purpose: grads must accumulate.
    ids = ids.at[0].set(ids[1])
    cot = jnp.asarray(rng.normal(size=(8, 4, D)), jnp.float32)

    def f_sharded(t):
        return jnp.vdot(sharded_gather(t, ids, mesh, dedup=True), cot)

    def f_dense(t):
        return jnp.vdot(jnp.take(t, ids, axis=0), cot)

    g1 = jax.grad(f_sharded)(table)
    g2 = jax.grad(f_dense)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-6)


def test_padded_vocab():
    assert padded_vocab(100, 4) % 4 == 0
    assert padded_vocab(100, 4) >= 100
    assert padded_vocab(96, 4, multiple=8) == 96
    assert padded_vocab(1, 8) == 64


def test_model_axis_must_divide():
    mesh = make_mesh(4)
    table = jnp.zeros((10, 4))  # 10 % 4 != 0
    with pytest.raises(ValueError):
        sharded_gather(table, jnp.zeros((4, 2), jnp.int32), mesh)


def test_single_shard_fast_path():
    mesh = make_mesh(1)
    table = jnp.arange(20.0).reshape(10, 2)
    ids = jnp.asarray([[1, 2], [3, 9]], jnp.int32)
    out = sharded_gather(table, ids, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(jnp.take(table, ids, axis=0)))
