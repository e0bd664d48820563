"""Pallas embedding gather vs. XLA oracle: forward + scatter-add grad."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqrec_tpu.ops import xla as xla_ops
from seqrec_tpu.ops.pallas import gather as pl_gather


def _setup(V=64, D=128, shape=(5, 7), seed=0):
    rng = np.random.default_rng(seed)
    table = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, V, size=shape), jnp.int32)
    return table, ids


@pytest.mark.parametrize("shape", [(8,), (5, 7), (3, 4, 2)])
def test_forward_parity(shape):
    table, ids = _setup(shape=shape)
    ref = xla_ops.embedding_gather(table, ids)
    got = pl_gather.embedding_gather(table, ids, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_gradient_is_scatter_add():
    table, ids = _setup(shape=(6, 3), seed=1)
    # Duplicate ids must accumulate.
    ids = ids.at[0].set(ids[1])
    cot = jnp.asarray(
        np.random.default_rng(2).normal(size=(6, 3, 128)), jnp.float32
    )

    def f_pl(t):
        return jnp.vdot(pl_gather.embedding_gather(t, ids, interpret=True), cot)

    def f_ref(t):
        return jnp.vdot(xla_ops.embedding_gather(t, ids), cot)

    g1 = jax.grad(f_pl)(table)
    g2 = jax.grad(f_ref)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)


def test_supported_gate(monkeypatch):
    # Default: OFF everywhere — honest on-chip timing showed XLA's gather
    # ~2x faster even at D=512 (see supported() comment).
    table = jnp.zeros((10, 512))
    assert not pl_gather.supported(table, jnp.zeros(16, jnp.int32))

    # Opt-in path keeps the alignment/size constraints.
    monkeypatch.setenv("SEQREC_ENABLE_PALLAS_GATHER", "1")
    table = jnp.zeros((10, 64))  # D=64 not lane-aligned
    assert not pl_gather.supported(table, jnp.zeros(16, jnp.int32))
    table = jnp.zeros((10, 256))  # lane-aligned but narrow: XLA wins
    assert not pl_gather.supported(table, jnp.zeros(16, jnp.int32))
    table = jnp.zeros((10, 512))
    assert pl_gather.supported(table, jnp.zeros(16, jnp.int32))
    assert not pl_gather.supported(table, jnp.zeros(2, jnp.int32))
