"""Pallas GRU kernel vs. XLA oracle: forward + gradient parity
(SURVEY.md §4 kernel tier; interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seqrec_tpu.ops import xla as xla_ops
from seqrec_tpu.ops.pallas import gru as pl_gru


def _inputs(B=8, T=12, D=16, H=128, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, T, D)), dtype)
    h0 = jnp.zeros((B, H), dtype)
    w_x = jnp.asarray(rng.normal(size=(D, 3 * H)) * 0.1, dtype)
    w_h = jnp.asarray(rng.normal(size=(H, 3 * H)) * 0.1, dtype)
    b_x = jnp.asarray(rng.normal(size=(3 * H,)) * 0.1, dtype)
    b_h = jnp.asarray(rng.normal(size=(3 * H,)) * 0.1, dtype)
    return x, h0, w_x, w_h, b_x, b_h


def test_forward_parity():
    args = _inputs()
    ys_ref, h_ref = xla_ops.gru_scan(*args)
    ys_pl, h_pl = pl_gru.gru_scan(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(ys_pl), np.asarray(ys_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_parity_small_hidden():
    args = _inputs(H=64)
    ys_ref, _ = xla_ops.gru_scan(*args)
    ys_pl, _ = pl_gru.gru_scan(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(ys_pl), np.asarray(ys_ref),
                               rtol=1e-5, atol=1e-5)


def test_gradient_parity():
    x, h0, w_x, w_h, b_x, b_h = _inputs(B=4, T=6, D=8, H=128)
    cot = jnp.asarray(
        np.random.default_rng(1).normal(size=(4, 6, 128)), jnp.float32
    )

    def loss_ref(x, w_x, w_h, b_x, b_h):
        ys, _ = xla_ops.gru_scan(x, h0, w_x, w_h, b_x, b_h)
        return jnp.vdot(ys, cot)

    def loss_pl(x, w_x, w_h, b_x, b_h):
        ys, _ = pl_gru.gru_scan(x, h0, w_x, w_h, b_x, b_h, interpret=True)
        return jnp.vdot(ys, cot)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w_x, w_h, b_x, b_h)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2, 3, 4))(x, w_x, w_h, b_x, b_h)
    for a, b, name in zip(g_pl, g_ref, ["x", "w_x", "w_h", "b_x", "b_h"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch: {name}",
        )


def test_final_state_is_last_output():
    args = _inputs(T=5)
    ys, h_last = pl_gru.gru_scan(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(h_last), np.asarray(ys[:, -1]))


def test_reset_mask_forward_parity():
    """Fused kernel with a mid-sequence reset plane == XLA oracle."""
    x, h0, w_x, w_h, b_x, b_h = _inputs(T=6, H=64)
    rng = np.random.default_rng(3)
    rm = jnp.asarray(rng.integers(0, 2, size=(8, 6)), jnp.float32)
    ys_pl, _ = pl_gru.gru_scan(x, h0, w_x, w_h, b_x, b_h, reset_mask=rm,
                               interpret=True)
    ys_ref, _ = xla_ops.gru_scan(x, h0, w_x, w_h, b_x, b_h, reset_mask=rm)
    np.testing.assert_allclose(np.asarray(ys_pl), np.asarray(ys_ref),
                               rtol=1e-5, atol=1e-5)


def test_reset_mask_gradient_parity():
    x, h0, w_x, w_h, b_x, b_h = _inputs(B=4, T=6, D=8, H=64)
    rng = np.random.default_rng(4)
    rm = jnp.asarray(rng.integers(0, 2, size=(4, 6)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(4, 6, 64)), jnp.float32)

    def loss(f):
        def g(x, h0, w_x, w_h, b_x, b_h):
            ys, _ = f(x, h0, w_x, w_h, b_x, b_h)
            return jnp.vdot(ys, cot)
        return jax.grad(g, argnums=(0, 1, 2, 3, 4, 5))

    g_ref = loss(
        lambda *a: xla_ops.gru_scan(*a, reset_mask=rm)
    )(x, h0, w_x, w_h, b_x, b_h)
    g_pl = loss(
        lambda *a: pl_gru.gru_scan(*a, reset_mask=rm, interpret=True)
    )(x, h0, w_x, w_h, b_x, b_h)
    for a, b, name in zip(g_pl, g_ref, ["x", "h0", "w_x", "w_h", "b_x", "b_h"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch: {name}",
        )


def test_bfloat16_inputs_upcast_and_match():
    """bf16 model inputs run the kernel in f32 (on-chip layout perf; see
    gru_scan docstring) and return bf16 matching the XLA path's dtype."""
    args = _inputs(H=64, dtype=jnp.bfloat16)
    ys_pl, h_pl = pl_gru.gru_scan(*args, interpret=True)
    assert ys_pl.dtype == jnp.bfloat16 and h_pl.dtype == jnp.bfloat16
    f32 = [a.astype(jnp.float32) for a in args]
    ys_ref, _ = xla_ops.gru_scan(*f32)
    np.testing.assert_allclose(
        np.asarray(ys_pl, np.float32), np.asarray(ys_ref), rtol=0.05, atol=0.05
    )


def test_bfloat16_gradients_flow():
    x, h0, w_x, w_h, b_x, b_h = _inputs(B=4, T=6, D=8, H=64,
                                        dtype=jnp.bfloat16)

    def loss(w):
        ys, _ = pl_gru.gru_scan(x, h0, w, w_h, b_x, b_h, interpret=True)
        return jnp.sum(ys.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(w_x)
    assert g.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(g.astype(jnp.float32)).all())
    assert float(jnp.max(jnp.abs(g.astype(jnp.float32)))) > 0.0
