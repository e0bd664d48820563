"""Pallas LSTM kernel vs. XLA oracle: forward + gradient parity, plus the
XLA oracle itself vs. a naive per-step LSTM (SURVEY.md §4 kernel tier;
interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from seqrec_tpu.ops import xla as xla_ops
from seqrec_tpu.ops.pallas import lstm as pl_lstm


def _inputs(B=8, T=12, D=16, H=128, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, T, D)), dtype)
    h0 = jnp.zeros((B, H), dtype)
    c0 = jnp.zeros((B, H), dtype)
    w_x = jnp.asarray(rng.normal(size=(D, 4 * H)) * 0.1, dtype)
    w_h = jnp.asarray(rng.normal(size=(H, 4 * H)) * 0.1, dtype)
    b = jnp.asarray(rng.normal(size=(4 * H,)) * 0.1, dtype)
    return x, h0, c0, w_x, w_h, b


def _naive_lstm(x, h0, c0, w_x, w_h, b):
    """Per-step numpy-style loop — independent oracle for the oracle."""
    B, T, D = x.shape
    H = h0.shape[-1]
    h, c = h0, c0
    ys = []
    for t in range(T):
        z = x[:, t] @ w_x + h @ w_h + b
        i = jax.nn.sigmoid(z[:, :H])
        f = jax.nn.sigmoid(z[:, H:2 * H])
        g = jnp.tanh(z[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(z[:, 3 * H:])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        ys.append(h)
    return jnp.stack(ys, axis=1), (h, c)


def test_xla_oracle_matches_naive_loop():
    args = _inputs(B=4, T=7, D=8, H=16)
    ys_ref, (h_ref, c_ref) = _naive_lstm(*args)
    ys, (h, c) = xla_ops.lstm_scan(*args)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_parity():
    args = _inputs()
    ys_ref, (h_ref, c_ref) = xla_ops.lstm_scan(*args)
    ys_pl, (h_pl, c_pl) = pl_lstm.lstm_scan(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(ys_pl), np.asarray(ys_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_pl), np.asarray(c_ref),
                               rtol=1e-4, atol=1e-4)


def test_forward_parity_small_hidden():
    args = _inputs(H=64)
    ys_ref, _ = xla_ops.lstm_scan(*args)
    ys_pl, _ = pl_lstm.lstm_scan(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(ys_pl), np.asarray(ys_ref),
                               rtol=1e-5, atol=1e-5)


def test_gradient_parity():
    x, h0, c0, w_x, w_h, b = _inputs(B=4, T=6, D=8, H=128)
    cot = jnp.asarray(
        np.random.default_rng(1).normal(size=(4, 6, 128)), jnp.float32
    )

    def loss_ref(x, w_x, w_h, b):
        ys, _ = xla_ops.lstm_scan(x, h0, c0, w_x, w_h, b)
        return jnp.vdot(ys, cot)

    def loss_pl(x, w_x, w_h, b):
        ys, _ = pl_lstm.lstm_scan(x, h0, c0, w_x, w_h, b, interpret=True)
        return jnp.vdot(ys, cot)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w_x, w_h, b)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2, 3))(x, w_x, w_h, b)
    for a, bb, name in zip(g_pl, g_ref, ["x", "w_x", "w_h", "b"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch: {name}",
        )


def test_forward_parity_bfloat16():
    """The production compute dtype: bf16 activations, f32 cell scratch."""
    args = _inputs(B=4, T=6, D=16, H=64, dtype=jnp.bfloat16)
    ys_ref, _ = xla_ops.lstm_scan(*args)
    ys_pl, _ = pl_lstm.lstm_scan(*args, interpret=True)
    np.testing.assert_allclose(
        np.asarray(ys_pl, np.float32), np.asarray(ys_ref, np.float32),
        rtol=0.05, atol=0.05,
    )


def test_final_state_is_last_output():
    args = _inputs(T=5)
    ys, (h_last, _) = pl_lstm.lstm_scan(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(h_last), np.asarray(ys[:, -1]))


def test_reset_mask_forward_parity():
    """Fused kernel with a random reset plane == XLA oracle (h AND c)."""
    x, h0, c0, w_x, w_h, b = _inputs(T=6, H=64)
    rng = np.random.default_rng(3)
    rm = jnp.asarray(rng.integers(0, 2, size=(8, 6)), jnp.float32)
    ys_pl, (_, c_pl) = pl_lstm.lstm_scan(x, h0, c0, w_x, w_h, b,
                                         reset_mask=rm, interpret=True)
    ys_ref, (_, c_ref) = xla_ops.lstm_scan(x, h0, c0, w_x, w_h, b,
                                           reset_mask=rm)
    np.testing.assert_allclose(np.asarray(ys_pl), np.asarray(ys_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_pl), np.asarray(c_ref),
                               rtol=1e-4, atol=1e-4)


def test_reset_mask_gradient_parity():
    x, h0, c0, w_x, w_h, b = _inputs(B=4, T=6, D=8, H=64)
    rng = np.random.default_rng(4)
    rm = jnp.asarray(rng.integers(0, 2, size=(4, 6)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(4, 6, 64)), jnp.float32)

    def grads_of(f):
        def g(x, h0, c0, w_x, w_h, b):
            ys, _ = f(x, h0, c0, w_x, w_h, b)
            return jnp.vdot(ys, cot)
        return jax.grad(g, argnums=(0, 1, 2, 3, 4, 5))

    g_ref = grads_of(
        lambda *a: xla_ops.lstm_scan(*a, reset_mask=rm)
    )(x, h0, c0, w_x, w_h, b)
    g_pl = grads_of(
        lambda *a: pl_lstm.lstm_scan(*a, reset_mask=rm, interpret=True)
    )(x, h0, c0, w_x, w_h, b)
    for a, bb, name in zip(g_pl, g_ref,
                           ["x", "h0", "c0", "w_x", "w_h", "b"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch: {name}",
        )


def test_reset_mask_restarts_state():
    x, h0, c0, w_x, w_h, b = _inputs(B=2, T=6, D=8, H=16)
    rm = jnp.zeros((2, 6), jnp.float32).at[:, 3].set(1.0)
    ys, _ = xla_ops.lstm_scan(x, h0, c0, w_x, w_h, b, reset_mask=rm)
    # Steps 3.. must equal a fresh run on the suffix alone.
    ys_fresh, _ = xla_ops.lstm_scan(x[:, 3:], h0, c0, w_x, w_h, b)
    np.testing.assert_allclose(np.asarray(ys[:, 3:]), np.asarray(ys_fresh),
                               rtol=1e-5, atol=1e-6)


def test_bfloat16_inputs_upcast_and_match():
    """bf16 inputs run the kernel in f32 and come back bf16 (see lstm_scan
    docstring for the on-chip rationale)."""
    args = _inputs(H=64, dtype=jnp.bfloat16)
    ys_pl, (h_pl, c_pl) = pl_lstm.lstm_scan(*args, interpret=True)
    assert ys_pl.dtype == jnp.bfloat16
    assert h_pl.dtype == jnp.bfloat16 and c_pl.dtype == jnp.bfloat16
    f32 = [a.astype(jnp.float32) for a in args]
    ys_ref, _ = xla_ops.lstm_scan(*f32)
    np.testing.assert_allclose(
        np.asarray(ys_pl, np.float32), np.asarray(ys_ref), rtol=0.05, atol=0.05
    )


def test_c_last_gradients_match_oracle():
    """c_last must be differentiable through the batched recompute — its
    gradients come from the chain rule through ys's analytic VJP and must
    match the XLA oracle (a stop_gradient bug here once zeroed dW entirely
    while leaking a spurious bias gradient)."""
    x, h0, c0, w_x, w_h, b = _inputs(B=4, T=6, D=8, H=16)

    def c_loss(fn):
        def g(w_x_, w_h_, b_):
            _, (_, c_last) = fn(x, h0, c0, w_x_, w_h_, b_)
            return jnp.sum(c_last ** 2)
        return jax.grad(g, argnums=(0, 1, 2))

    g_ref = c_loss(xla_ops.lstm_scan)(w_x, w_h, b)
    g_pl = c_loss(
        lambda *a: pl_lstm.lstm_scan(*a, interpret=True)
    )(w_x, w_h, b)
    for a, bb, name in zip(g_pl, g_ref, ["w_x", "w_h", "b"]):
        assert float(jnp.max(jnp.abs(bb))) > 0.0  # oracle grad is nonzero
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=2e-4, atol=2e-4,
            err_msg=f"c_last grad mismatch: {name}",
        )
