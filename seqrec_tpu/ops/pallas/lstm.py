"""Fused Pallas LSTM scan (reference NMT-lineage `unit_type=lstm`; TF
`LSTMBlockCell` / cuDNN-LSTM analog).

Identical TPU-first layout to the fused GRU (ops/pallas/gru.py):

- grid=(T,), one time step per grid slot; TPU grid execution is sequential,
  so h AND c live in VMEM scratch buffers persistent across grid steps —
  both states and both weight matrices stay on-chip for the whole scan;
- each step streams only x[t] ([B, D]) in and h[t] ([B, H]) out; the input
  projection x @ Wx runs on the MXU inside the kernel, fused with the
  recurrent matmul h @ U and the VPU gate math, so the [B, T, 4H] projection
  intermediate never touches HBM;
- gate block order i|f|g|o, matching ops/xla.py::lstm_gates (the oracle).

Backward: analytic BPTT (standard LSTM gradient identities) as a reverse
lax.scan of dense XLA ops over the saved per-step h outputs; cell states are
recomputed forward in one cheap scan (they are not saved by the kernel),
and the input projection is recomputed as one parallel-over-T MXU matmul.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

UNROLL: Optional[int] = None  # time steps per grid slot; None = auto


def _pick_unroll(T: int) -> int:
    """Time steps per grid slot (see ops/pallas/gru.py — same rationale)."""
    if UNROLL is not None:
        return UNROLL if T % UNROLL == 0 else 1
    for u in (4, 2):
        if T % u == 0:
            return u
    return 1


def supported(x: jax.Array, h0: jax.Array) -> bool:
    """Dispatch gate: sublane-aligned dims, modest VMEM footprint — kernel
    ON wherever it fits.

    r5 audit detail (the step level overrules the micro level): the
    ISOLATED scan A/B (benchmarks/scan_ab.py) reads XLA 1.18x faster at
    the shipped ml1m_lstm shape (D=H=128, T=200), but the FULL-train-step
    alternated A/B reads the KERNEL 1.12x faster (2.086 vs 2.344 ms,
    per-rep ratio 0.896, range 0.82-0.90) — in an isolated chain XLA can
    fuse the toy loss into its own scan while the kernel is an opaque
    custom call, biasing micro numbers against the kernel. Real steps
    surround the scan with embedding/head work, and there the kernel's
    VMEM-resident state wins. (The GRU gate's flip is step-level-confirmed
    in the other direction: XLA 1.465x on the full ml1m step — gru.py.)"""
    B, T, D = x.shape
    H = h0.shape[-1]
    U = _pick_unroll(T)
    vmem = 4 * (U * B * D + B * H * (2 + U) + (D + H) * 4 * H + B * 4 * H)
    return H % 8 == 0 and D % 8 == 0 and vmem < 10 * 1024 * 1024


def _lstm_step_body(x_ref, w_x_ref, w_h_ref, b_ref, h0_ref, c0_ref,
                    ys_ref, h_ref, c_ref, keep_ref=None):
    """UNROLL time steps per grid slot; h_ref/c_ref are persistent VMEM
    scratch. keep_ref ([U, B, 1] per slot, 0.0 = reset state BEFORE that
    step) is present only in the session-parallel variant. The unroll
    amortizes per-grid-step machinery over several time steps (see
    ops/pallas/gru.py — same rationale and measurements)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[:] = h0_ref[:]
        # c scratch accumulates in float32 regardless of the compute dtype.
        c_ref[:] = c0_ref[:].astype(c_ref.dtype)

    h = h_ref[:]
    c = c_ref[:]
    U = x_ref.shape[0]
    for u in range(U):  # python-unrolled at trace time
        if keep_ref is not None:
            keep = keep_ref[u]
            h = h * keep
            c = c * keep.astype(c_ref.dtype)
        z = (
            jnp.dot(x_ref[u], w_x_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(h, w_h_ref[:], preferred_element_type=jnp.float32)
            + b_ref[:]
        )
        H = h.shape[-1]
        i = jax.nn.sigmoid(z[:, :H])
        f = jax.nn.sigmoid(z[:, H:2 * H])
        g = jnp.tanh(z[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(z[:, 3 * H:])
        c = f * c + i * g
        h = (o * jnp.tanh(c)).astype(h_ref.dtype)
        ys_ref[u] = h
    c_ref[:] = c.astype(c_ref.dtype)
    h_ref[:] = h


def _lstm_step_kernel(x_ref, w_x_ref, w_h_ref, b_ref, h0_ref, c0_ref,
                      ys_ref, h_ref, c_ref):
    _lstm_step_body(x_ref, w_x_ref, w_h_ref, b_ref, h0_ref, c0_ref,
                    ys_ref, h_ref, c_ref)


def _lstm_step_kernel_reset(x_ref, keep_ref, w_x_ref, w_h_ref, b_ref,
                            h0_ref, c0_ref, ys_ref, h_ref, c_ref):
    _lstm_step_body(x_ref, w_x_ref, w_h_ref, b_ref, h0_ref, c0_ref,
                    ys_ref, h_ref, c_ref, keep_ref=keep_ref)


def _lstm_forward_pallas(
    x: jax.Array,  # [B, T, D]
    h0: jax.Array,  # [B, H]
    c0: jax.Array,  # [B, H]
    w_x: jax.Array,  # [D, 4H]
    w_h: jax.Array,  # [H, 4H]
    b: jax.Array,  # [4H]
    reset: Optional[jax.Array] = None,  # [B, T] 1.0 = reset BEFORE step t
    *,
    interpret: bool = False,
) -> jax.Array:  # ys [B, T, H]
    B, T, D = x.shape
    H4 = w_h.shape[-1]
    H = H4 // 4
    U = _pick_unroll(T)
    xs = jnp.swapaxes(x, 0, 1)  # [T, B, D] — time-major for the grid
    x_spec = pl.BlockSpec((U, B, D), lambda t: (t, 0, 0),
                          memory_space=pltpu.VMEM)
    common_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # w_x resident
        pl.BlockSpec(memory_space=pltpu.VMEM),  # w_h resident
        pl.BlockSpec(memory_space=pltpu.VMEM),  # b [1, 4H]
        pl.BlockSpec(memory_space=pltpu.VMEM),  # h0
        pl.BlockSpec(memory_space=pltpu.VMEM),  # c0
    ]
    if reset is None:
        kernel, in_specs = _lstm_step_kernel, [x_spec] + common_specs
        operands = (xs, w_x, w_h, b.reshape(1, H4), h0, c0)
    else:
        keep = (1.0 - jnp.swapaxes(reset, 0, 1)).astype(x.dtype)[:, :, None]
        keep_spec = pl.BlockSpec((U, B, 1), lambda t: (t, 0, 0),
                                 memory_space=pltpu.VMEM)
        kernel = _lstm_step_kernel_reset
        in_specs = [x_spec, keep_spec] + common_specs
        operands = (xs, keep, w_x, w_h, b.reshape(1, H4), h0, c0)
    ys = pl.pallas_call(
        kernel,
        grid=(T // U,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((U, B, H), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), x.dtype),
        scratch_shapes=[pltpu.VMEM((B, H), x.dtype),
                        pltpu.VMEM((B, H), jnp.float32)],
        interpret=interpret,
    )(*operands)
    return jnp.swapaxes(ys, 0, 1)  # [B, T, H]


def _keep_plane(reset, B, T, dtype):
    """[B, T, 1] keep multipliers (1 - reset); ones when reset is None."""
    if reset is None:
        return jnp.ones((B, T, 1), dtype)
    return (1.0 - reset.astype(dtype))[:, :, None]


def _recompute_cells(
    x_proj: jax.Array,  # [B, T, 4H]
    hs: jax.Array,  # [B, T, H] saved h outputs
    h0: jax.Array,  # [B, H]
    c0: jax.Array,  # [B, H]
    w_h: jax.Array,  # [H, 4H]
    reset: Optional[jax.Array] = None,  # [B, T]
) -> jax.Array:  # cs [B, T, H] (c_1..c_T), float32
    """Forward-recompute cell states from saved h's: with h_prev known at
    every step, c_t = f_t * (keep_t * c_{t-1}) + i_t * g_t needs no
    sequential matmul — the h @ U projections for ALL steps batch into one
    MXU matmul (h_prev is masked by keep first, matching the kernel)."""
    B, T, H = hs.shape
    keep_all = _keep_plane(reset, B, T, x_proj.dtype)
    h_prev_all = jnp.concatenate([h0[:, None], hs[:, :-1]], axis=1) * keep_all
    z = x_proj + jnp.einsum("bth,hk->btk", h_prev_all, w_h,
                            preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(z[..., :H]).astype(jnp.float32)
    f = jax.nn.sigmoid(z[..., H:2 * H]).astype(jnp.float32)
    g = jnp.tanh(z[..., 2 * H:3 * H]).astype(jnp.float32)

    def step(c, inp):
        i_t, f_t, g_t, keep_t = inp
        c_next = f_t * (keep_t * c) + i_t * g_t
        return c_next, c_next

    _, cs = lax.scan(
        step,
        c0.astype(jnp.float32),
        (jnp.swapaxes(i, 0, 1), jnp.swapaxes(f, 0, 1), jnp.swapaxes(g, 0, 1),
         jnp.swapaxes(keep_all.astype(jnp.float32), 0, 1)),
    )
    return jnp.swapaxes(cs, 0, 1)


def _lstm_bwd_math(
    x_proj: jax.Array,  # [B, T, 4H]
    hs: jax.Array,  # [B, T, H] outputs h_1..h_T
    cs: jax.Array,  # [B, T, H] cells c_1..c_T (float32)
    h0: jax.Array,  # [B, H]
    c0: jax.Array,  # [B, H]
    w_h: jax.Array,  # [H, 4H]
    g_ys: jax.Array,  # [B, T, H] cotangent of outputs
    reset: Optional[jax.Array] = None,  # [B, T]
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Analytic LSTM BPTT.

    Returns (d_x_proj, d_h0, d_c0, d_w_h, d_b).

    Same serial-latency discipline as the GRU backward: gate recomputation
    (h_in_all @ U for every step at once) and the weight/bias gradient
    reductions are batched over T outside the reverse scan; the scan body
    keeps only the single cotangent-dependent matmul (dz @ Uᵀ) plus VPU
    algebra — the minimum serial work BPTT admits."""
    H = h0.shape[-1]
    B, T = hs.shape[0], hs.shape[1]
    dtype = x_proj.dtype

    keep_all = _keep_plane(reset, B, T, dtype)
    h_prev_all = jnp.concatenate([h0[:, None], hs[:, :-1]], axis=1)
    c_prev_all = jnp.concatenate(
        [c0.astype(jnp.float32)[:, None], cs[:, :-1]], axis=1
    )
    h_in_all = h_prev_all * keep_all
    c_in_all = c_prev_all * keep_all.astype(jnp.float32)

    # Recompute all gates in parallel over T (one big MXU matmul + VPU).
    z_all = x_proj + jnp.einsum("bth,hk->btk", h_in_all, w_h,
                                preferred_element_type=dtype)
    i_all = jax.nn.sigmoid(z_all[..., :H]).astype(jnp.float32)
    f_all = jax.nn.sigmoid(z_all[..., H:2 * H]).astype(jnp.float32)
    g_all = jnp.tanh(z_all[..., 2 * H:3 * H]).astype(jnp.float32)
    o_all = jax.nn.sigmoid(z_all[..., 3 * H:]).astype(jnp.float32)
    tanh_c_all = jnp.tanh(cs)

    w_h_t = w_h.T  # hoisted transpose

    def step(carry, inp):
        dh_next, dc_next = carry
        i, f, g, o, tanh_c, c_in, keep, g_y = inp
        dh = dh_next + g_y.astype(jnp.float32)
        do = dh * tanh_c
        dc = dc_next + dh * o * (1.0 - tanh_c * tanh_c)
        di = dc * g
        df = dc * c_in
        dg = dc * i
        dzi = di * i * (1.0 - i)
        dzf = df * f * (1.0 - f)
        dzg = dg * (1.0 - g * g)
        dzo = do * o * (1.0 - o)
        dz = jnp.concatenate([dzi, dzf, dzg, dzo], axis=-1).astype(dtype)
        keep32 = keep.astype(jnp.float32)
        dh_prev = jnp.dot(dz, w_h_t, preferred_element_type=dtype).astype(
            jnp.float32
        ) * keep32
        dc_prev = dc * f * keep32
        return (dh_prev, dc_prev), dz

    inps = tuple(
        jnp.swapaxes(a, 0, 1)
        for a in (i_all, f_all, g_all, o_all, tanh_c_all, c_in_all,
                  keep_all, g_ys)
    )
    init = (
        jnp.zeros(h0.shape, jnp.float32),
        jnp.zeros(h0.shape, jnp.float32),
    )
    (dh0, dc0), dz_t = lax.scan(step, init, inps, reverse=True)
    dz_all = jnp.swapaxes(dz_t, 0, 1)  # [B, T, 4H]

    # Weight/bias gradient reductions, batched over all T at once.
    dW = jnp.einsum("bth,btk->hk", h_in_all, dz_all,
                    preferred_element_type=dtype)
    db = jnp.sum(dz_all, axis=(0, 1))
    return (
        dz_all,
        dh0.astype(h0.dtype),
        dc0.astype(c0.dtype),
        dW,
        db,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _lstm_core(x, h0, c0, w_x, w_h, b, reset, interpret):
    return _lstm_forward_pallas(x, h0, c0, w_x, w_h, b, reset,
                                interpret=interpret)


def _lstm_core_fwd(x, h0, c0, w_x, w_h, b, reset, interpret):
    ys = _lstm_forward_pallas(x, h0, c0, w_x, w_h, b, reset,
                              interpret=interpret)
    return ys, (x, ys, h0, c0, w_x, w_h, b, reset)


def _lstm_core_bwd(interpret, res, g_ys):
    x, ys, h0, c0, w_x, w_h, b, reset = res
    dtype = x.dtype
    # Recompute the input projection in one parallel-over-T MXU matmul;
    # f32 accumulation regardless of the (possibly bf16) storage dtype.
    x_proj = jnp.einsum("btd,dh->bth", x, w_x,
                        preferred_element_type=jnp.float32) + b
    cs = _recompute_cells(x_proj, ys, h0, c0, w_h, reset)
    d_xp, dh0, dc0, dW_h, db = _lstm_bwd_math(
        x_proj, ys, cs, h0, c0, w_h, g_ys, reset
    )
    d_x = jnp.einsum("bth,dh->btd", d_xp, w_x,
                     preferred_element_type=jnp.float32).astype(dtype)
    dW_x = jnp.einsum("btd,bth->dh", x, d_xp,
                      preferred_element_type=jnp.float32).astype(w_x.dtype)
    db_out = jnp.sum(d_xp, axis=(0, 1)).astype(b.dtype)
    d_reset = None if reset is None else jnp.zeros_like(reset)
    return d_x, dh0, dc0, dW_x, dW_h.astype(w_h.dtype), db_out, d_reset


_lstm_core.defvjp(_lstm_core_fwd, _lstm_core_bwd)


def lstm_scan(
    x: jax.Array,  # [B, T, D_in]
    h0: jax.Array,  # [B, H]
    c0: jax.Array,  # [B, H]
    w_x: jax.Array,  # [D_in, 4H]
    w_h: jax.Array,  # [H, 4H]
    b: Optional[jax.Array] = None,
    *,
    reset_mask: Optional[jax.Array] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Drop-in fused version of ops.xla.lstm_scan (same signature/semantics),
    including `reset_mask` (session-parallel streaming — keep plane streamed
    into the kernel, analytic BPTT accounts for the pre-step zeroing).

    The final cell state is recomputed from the saved h's in one batched
    matmul + cheap scan (the kernel saves only h's). The recompute is
    DIFFERENTIABLE — ys carries the kernel's analytic VJP, so autodiff
    through the recompute yields the oracle's c_last gradients by the chain
    rule — and XLA dead-code-eliminates the whole recompute (forward and
    backward) when the caller drops c_last or stop-gradients it, which is
    what the TBPTT trainer does with the carry.

    Dtype policy: identical to gru_scan (see its docstring for the
    measurements) — narrow shapes upcast sub-f32 inputs to f32 (bf16
    (16,128) tile relayouts of sub-128 blocks cost ~4x); wide tile-aligned
    shapes (D, H multiples of 128, B a multiple of 16) keep bf16 storage with f32 MXU
    accumulation, f32 gate math, f32 biases, and the cell state always
    accumulates in an f32 VMEM scratch. Boundary casts are linear so
    gradients pass through unchanged; BPTT accumulates in f32 throughout.
    """
    in_dtype = x.dtype
    B, _, D = x.shape
    H = h0.shape[-1]
    wide_bf16 = (
        in_dtype == jnp.bfloat16
        and D % 128 == 0
        and H % 128 == 0
        and B % 16 == 0
    )
    dtype = in_dtype if (in_dtype == jnp.float32 or wide_bf16) else jnp.float32
    H4 = w_h.shape[-1]
    x = x.astype(dtype)
    b_c = (b if b is not None
           else jnp.zeros(H4, jnp.float32)).astype(jnp.float32)
    ys = _lstm_core(x, h0.astype(dtype), c0.astype(dtype),
                    w_x.astype(dtype), w_h.astype(dtype), b_c, reset_mask,
                    interpret)
    x_proj = jnp.einsum("btd,dh->bth", x, w_x.astype(dtype),
                        preferred_element_type=jnp.float32) + b_c
    cs = _recompute_cells(
        x_proj, ys, h0.astype(dtype), c0.astype(dtype),
        w_h.astype(dtype), reset_mask,
    )
    ys = ys.astype(in_dtype)
    return ys, (ys[:, -1], cs[:, -1].astype(in_dtype))
