"""Pallas causal flash-attention vs. XLA oracle: forward + grad parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqrec_tpu.ops import xla as xla_ops
from seqrec_tpu.ops.pallas import attention as pl_attn


def _qkv(B=2, T=50, N=2, Dh=32, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(B, T, N, Dh)), jnp.float32)
    return mk(), mk(), mk()


@pytest.mark.parametrize("T", [16, 128, 200])
def test_forward_parity(T):
    q, k, v = _qkv(T=T)
    ref = xla_ops.causal_attention(q, k, v)
    got = pl_attn.causal_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_forward_parity_custom_scale():
    q, k, v = _qkv(T=20)
    ref = xla_ops.causal_attention(q, k, v, scale=0.5)
    got = pl_attn.causal_attention(q, k, v, scale=0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gradient_parity():
    q, k, v = _qkv(B=2, T=40, N=1, Dh=16, seed=1)
    cot = jnp.asarray(
        np.random.default_rng(2).normal(size=q.shape), jnp.float32
    )

    def loss_ref(q, k, v):
        return jnp.vdot(xla_ops.causal_attention(q, k, v), cot)

    def loss_pl(q, k, v):
        return jnp.vdot(pl_attn.causal_attention(q, k, v, interpret=True), cot)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_pl, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch: d{name}",
        )


def test_causality_in_kernel():
    """Future keys must not affect earlier outputs (kernel-level leak test)."""
    q, k, v = _qkv(T=33, seed=3)
    out1 = pl_attn.causal_attention(q, k, v, interpret=True)
    k2 = k.at[:, 20:].set(0.0)
    v2 = v.at[:, 20:].set(-5.0)
    out2 = pl_attn.causal_attention(q, k2, v2, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out1[:, :20]), np.asarray(out2[:, :20]), rtol=1e-6
    )
    assert not np.allclose(np.asarray(out1[:, 20:]), np.asarray(out2[:, 20:]))
