"""Fused Pallas GRU scan (SURVEY.md §2 #5; TF `GRUBlockCell` analog).

TPU-first layout (see ops/xla.py for the gate convention — identical math):

- grid=(T,), one time step per grid slot. TPU grid execution is sequential,
  so the hidden state lives in a VMEM scratch buffer that persists across
  grid steps — h and BOTH weight matrices stay on-chip for the entire scan;
- each step streams only the raw embeddings x[t] ([B, D]) and computes the
  input projection x @ Wx on the MXU inside the kernel, fused with the
  recurrent matmul h @ U and the VPU gate math. Versus projecting x outside
  the kernel (the v1 design and what a lax.scan of dense ops does), this
  removes the [B, T, 3H] x-projection intermediate from HBM entirely:
  scan-path HBM traffic drops from ~(D + 6H + H) to ~(D + H) floats per
  (batch, step) — ~4x for D == H;
- outputs ys[t] ([B, H]) are the only per-step write.

Backward: analytic BPTT over the saved per-step outputs (standard GRU
gradient identities) as a reverse lax.scan of dense XLA ops; the input
projection is recomputed in one big MXU matmul (cheap, parallel over T).
The XLA version doubles as the grad oracle in tests/kernels.
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
    """Time steps per grid slot (must divide T; shipped T: 200, 100, 50,
    30, 16). Unrolling amortizes per-grid-step machinery (block
    bookkeeping, DMA rendezvous) over several steps. Measured on the relay
    (fwd, B=128, T=200, D=H=64, median of 15 ALTERNATED reps, 2026-08-21):
    U=1 0.174 ms, U=4 0.174, U=8 0.148 — performance-neutral here (the
    serial matmul chain already hides the grid overhead; an early 4x
    reading was relay drift, not signal). Kept ON at U=4: free today,
    and grid overhead is hardware-dependent headroom on real silicon."""
    if UNROLL is not None:
        return UNROLL if T % UNROLL == 0 else 1
    for u in (4, 2):
        if T % u == 0:
            return u
    return 1


def supported(x: jax.Array, h0: jax.Array) -> bool:
    """Dispatch gate: sublane-aligned dims, modest VMEM footprint, and the
    MEASURED win window only (r5 re-audit, benchmarks/scan_ab.py).

    History: r3/r4 measured this kernel "2x XLA" with per-step-dispatch
    chains of sub-ms ops — which time the relay's DISPATCH rate, not the
    op (DESIGN.md §5). With dispatch amortized (inner-folded chains, the
    same amortization `steps_per_call=8` gives every shipped config), the
    r5 alternated per-rep ratios flipped: XLA's fused scan wins 1.86x at
    the ml1m shape (B=128, T=200, D=H=64: 0.215 vs 0.398 ms fwd+bwd,
    spread 1%), 1.66x at the wide demo (D=512), and the full ml1m train
    step runs 1.465x faster with XLA routed (1.031 vs 1.379 ms, same-
    weather). The boundary is WIDTH, not sequence length. Measured points
    (isolated scan A/B via scan_ab.py; full-step alternated A/B where
    noted — the step level overrules micro numbers, see lstm.py):
      D=64/T=200: XLA 1.465x (FULL STEP)   D=64/T=50: XLA 1.06x
      D=128/T=50: kernel 1.166x            D=128/T=200: kernel ~1.03x
                                           (FULL STEP, range 0.69-0.99)
      D=256/T=50: parity (step, noisy)     D=512/T=200: XLA 1.66x
    At D=64 the per-step matmul is so small that XLA's unrolled scan body
    fuses better than the kernel's grid machinery; at D>=256 XLA's scan
    is at/above parity and the kernel buys nothing. The gate opens ONLY
    for 64 < D,H <= 128 (any T) — the shipped session/large-catalog
    width (rsc15_10m, synthetic10m) — and routes XLA elsewhere. The
    kernel stays parity-tested as the fused-scan seam (PARITY.md #5)."""
    B, T, D = x.shape
    H = h0.shape[-1]
    U = _pick_unroll(T)
    vmem = 4 * (U * B * D + B * H * (1 + U) + (D + H) * 3 * H + B * 3 * H)
    return (H % 8 == 0 and D % 8 == 0
            and 64 < D <= 128 and 64 < H <= 128
            and vmem < 10 * 1024 * 1024)


def _gru_step_body(x_ref, w_x_ref, w_h_ref, b_x_ref, b_h_ref, h0_ref,
                   ys_ref, h_ref, keep_ref=None):
    """UNROLL time steps per grid slot; h_ref is persistent VMEM scratch.
    keep_ref ([U, B, 1] per slot, 0.0 = reset state BEFORE that step) is
    present only in the session-parallel variant.

    The unroll amortizes per-grid-step machinery (block bookkeeping, DMA
    rendezvous) over several time steps — at narrow shipped widths (D=H=64)
    the per-step matmuls are so small that this overhead, not the MXU, set
    the scan's latency floor."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[:] = h0_ref[:]

    h = h_ref[:]
    U = x_ref.shape[0]
    for u in range(U):  # python-unrolled at trace time
        h_in = h
        if keep_ref is not None:
            h_in = h_in * keep_ref[u]
        xp = (
            jnp.dot(x_ref[u], w_x_ref[:], preferred_element_type=jnp.float32)
            + b_x_ref[:]
        )
        hp = (
            jnp.dot(h_in, w_h_ref[:], preferred_element_type=jnp.float32)
            + b_h_ref[:]
        )
        H = h_in.shape[-1]
        xr, xz, xn = xp[:, :H], xp[:, H:2 * H], xp[:, 2 * H:]
        hr, hz, hn = hp[:, :H], hp[:, H:2 * H], hp[:, 2 * H:]
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h = ((1.0 - z) * n + z * h_in).astype(h_ref.dtype)
        ys_ref[u] = h
    h_ref[:] = h


def _gru_step_kernel(x_ref, w_x_ref, w_h_ref, b_x_ref, b_h_ref, h0_ref,
                     ys_ref, h_ref):
    _gru_step_body(x_ref, w_x_ref, w_h_ref, b_x_ref, b_h_ref, h0_ref,
                   ys_ref, h_ref)


def _gru_step_kernel_reset(x_ref, keep_ref, w_x_ref, w_h_ref, b_x_ref,
                           b_h_ref, h0_ref, ys_ref, h_ref):
    _gru_step_body(x_ref, w_x_ref, w_h_ref, b_x_ref, b_h_ref, h0_ref,
                   ys_ref, h_ref, keep_ref=keep_ref)


def _gru_forward_pallas(
    x: jax.Array,  # [B, T, D]
    h0: jax.Array,  # [B, H]
    w_x: jax.Array,  # [D, 3H]
    w_h: jax.Array,  # [H, 3H]
    b_x: jax.Array,  # [3H]
    b_h: jax.Array,  # [3H]
    reset: Optional[jax.Array] = None,  # [B, T] 1.0 = reset BEFORE step t
    *,
    interpret: bool = False,
) -> jax.Array:  # ys [B, T, H]
    B, T, D = x.shape
    H3 = w_h.shape[-1]
    H = H3 // 3
    U = _pick_unroll(T)
    xs = jnp.swapaxes(x, 0, 1)  # [T, B, D] — time-major for the grid
    x_spec = pl.BlockSpec((U, B, D), lambda t: (t, 0, 0),
                          memory_space=pltpu.VMEM)
    common_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # w_x resident
        pl.BlockSpec(memory_space=pltpu.VMEM),  # w_h resident
        pl.BlockSpec(memory_space=pltpu.VMEM),  # b_x [1, 3H]
        pl.BlockSpec(memory_space=pltpu.VMEM),  # b_h [1, 3H]
        pl.BlockSpec(memory_space=pltpu.VMEM),  # h0
    ]
    if reset is None:
        kernel, in_specs = _gru_step_kernel, [x_spec] + common_specs
        operands = (xs, w_x, w_h, b_x.reshape(1, H3), b_h.reshape(1, H3), h0)
    else:
        keep = (1.0 - jnp.swapaxes(reset, 0, 1)).astype(x.dtype)[:, :, None]
        keep_spec = pl.BlockSpec((U, B, 1), lambda t: (t, 0, 0),
                                 memory_space=pltpu.VMEM)
        kernel = _gru_step_kernel_reset
        in_specs = [x_spec, keep_spec] + common_specs
        operands = (xs, keep, w_x, w_h, b_x.reshape(1, H3),
                    b_h.reshape(1, H3), h0)
    ys = pl.pallas_call(
        kernel,
        grid=(T // U,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((U, B, H), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), x.dtype),
        scratch_shapes=[pltpu.VMEM((B, H), x.dtype)],
        interpret=interpret,
    )(*operands)
    return jnp.swapaxes(ys, 0, 1)  # [B, T, H]


def _gru_bwd_math(
    x_proj: jax.Array,  # [B, T, 3H]
    hs: jax.Array,  # [B, T, H] outputs (h_1..h_T)
    h0: jax.Array,  # [B, H]
    w_h: jax.Array,  # [H, 3H]
    b_h: jax.Array,  # [3H]
    g_ys: jax.Array,  # [B, T, H] cotangent of outputs
    reset: Optional[jax.Array] = None,  # [B, T]
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Analytic GRU BPTT. Returns (d_x_proj, d_h0, d_w_h, d_b_h).

    Per step (forward): h_in = keep * h_prev (keep = 1 - reset),
    r = σ(xr+hr), z = σ(xz+hz), n = tanh(xn + r*hn),
    h' = (1-z) n + z h_in, where [hr|hz|hn] = h_in @ U + b_h.

    Structured for the MXU's serial-latency wall: every per-step matmul that
    does NOT depend on the running cotangent is hoisted out of the reverse
    scan into one batched matmul over all T — gate recomputation
    (h_in_all @ U) up front, and the weight/bias gradient reductions
    (Σ_t h_inᵀ d_hproj) afterwards. The scan body is left with exactly one
    matmul (d_hproj @ Uᵀ, the true recurrence) plus VPU gate algebra, which
    is the minimum serial work BPTT admits. Measured on chip this is the
    difference between the backward costing ~6x the forward and ~2x.
    """
    H = h0.shape[-1]
    B, T = hs.shape[0], hs.shape[1]
    dtype = x_proj.dtype

    h_prev_all = jnp.concatenate([h0[:, None], hs[:, :-1]], axis=1)  # [B,T,H]
    keep_all = (
        jnp.ones((B, T, 1), dtype)
        if reset is None
        else (1.0 - reset.astype(dtype))[:, :, None]
    )
    h_in_all = h_prev_all * keep_all  # state each step actually consumed

    # Recompute all gates in parallel over T (one big MXU matmul + VPU).
    h_proj_all = (
        jnp.einsum("bth,hk->btk", h_in_all, w_h,
                   preferred_element_type=dtype)
        + b_h
    )
    xr, xz, xn = x_proj[..., :H], x_proj[..., H:2 * H], x_proj[..., 2 * H:]
    hr, hz, hn_all = (h_proj_all[..., :H], h_proj_all[..., H:2 * H],
                      h_proj_all[..., 2 * H:])
    r_all = jax.nn.sigmoid(xr + hr)
    z_all = jax.nn.sigmoid(xz + hz)
    n_all = jnp.tanh(xn + r_all * hn_all)

    w_h_t = w_h.T  # hoisted transpose

    def step(dh_next, inp):
        r, z, n, hn, h_in, keep, g_y = inp
        dh = dh_next + g_y
        # h_out = (1-z) n + z h_in
        dn = dh * (1.0 - z)
        dz = dh * (h_in - n)
        dpre_n = dn * (1.0 - n * n)  # d(xn + r*hn)
        dr = dpre_n * hn
        dpre_z = dz * z * (1.0 - z)
        dpre_r = dr * r * (1.0 - r)
        d_xp = jnp.concatenate([dpre_r, dpre_z, dpre_n], axis=-1)
        d_hproj = jnp.concatenate(
            [dpre_r, dpre_z, dpre_n * r], axis=-1
        )  # [B, 3H]
        dh_prev = (
            dh * z
            + jnp.dot(d_hproj, w_h_t, preferred_element_type=dtype)
        ) * keep
        return dh_prev, d_xp

    inps = tuple(
        jnp.swapaxes(a, 0, 1)
        for a in (r_all, z_all, n_all, hn_all, h_in_all, keep_all, g_ys)
    )
    # f32 carry regardless of (possibly bf16) storage dtype: the running
    # cotangent must accumulate at full precision.
    dh0, d_xp_t = lax.scan(
        step, jnp.zeros(h0.shape, jnp.float32), inps, reverse=True
    )
    d_xp = jnp.swapaxes(d_xp_t, 0, 1)  # [B, T, 3H]

    # d_hproj differs from d_xp only in the n-block (scaled by r); rebuild it
    # and reduce the weight/bias grads in single batched ops.
    d_hproj_all = jnp.concatenate(
        [d_xp[..., :2 * H], d_xp[..., 2 * H:] * r_all], axis=-1
    )
    dW = jnp.einsum("bth,btk->hk", h_in_all, d_hproj_all,
                    preferred_element_type=dtype)
    db = jnp.sum(d_hproj_all, axis=(0, 1))
    return d_xp, dh0, dW, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _gru_core(x, h0, w_x, w_h, b_x, b_h, reset, interpret):
    return _gru_forward_pallas(x, h0, w_x, w_h, b_x, b_h, reset,
                               interpret=interpret)


def _gru_core_fwd(x, h0, w_x, w_h, b_x, b_h, reset, interpret):
    ys = _gru_forward_pallas(x, h0, w_x, w_h, b_x, b_h, reset,
                             interpret=interpret)
    return ys, (x, ys, h0, w_x, w_h, b_x, b_h, reset)


def _gru_core_bwd(interpret, res, g_ys):
    x, ys, h0, w_x, w_h, b_x, b_h, reset = res
    dtype = x.dtype
    # Recompute the input projection in one parallel-over-T MXU matmul.
    # f32 accumulation regardless of the (possibly bf16) storage dtype.
    x_proj = jnp.einsum("btd,dh->bth", x, w_x,
                        preferred_element_type=jnp.float32) + b_x
    d_xp, dh0, dW_h, db_h = _gru_bwd_math(x_proj, ys, h0, w_h, b_h, g_ys,
                                          reset)
    d_x = jnp.einsum("bth,dh->btd", d_xp, w_x,
                     preferred_element_type=jnp.float32).astype(dtype)
    dW_x = jnp.einsum("btd,bth->dh", x, d_xp,
                      preferred_element_type=jnp.float32).astype(w_x.dtype)
    db_x = jnp.sum(d_xp, axis=(0, 1)).astype(b_x.dtype)
    d_reset = None if reset is None else jnp.zeros_like(reset)
    return d_x, dh0.astype(h0.dtype), dW_x, dW_h.astype(w_h.dtype), db_x, \
        db_h.astype(b_h.dtype), d_reset


_gru_core.defvjp(_gru_core_fwd, _gru_core_bwd)


def gru_scan(
    x: jax.Array,  # [B, T, D_in]
    h0: jax.Array,  # [B, H]
    w_x: jax.Array,  # [D_in, 3H]
    w_h: jax.Array,  # [H, 3H]
    b_x: Optional[jax.Array] = None,
    b_h: Optional[jax.Array] = None,
    *,
    reset_mask: Optional[jax.Array] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in fused version of ops.xla.gru_scan (same signature/semantics),
    including `reset_mask` (session-parallel streaming): the keep plane
    streams into the kernel as a [T, B, 1] input and the analytic BPTT
    backward accounts for the pre-step state zeroing.

    Dtype policy (VERDICT r3 task 6 measurements):
    - NARROW towers (any of D, H not a multiple of 128, or B not a multiple of 16): bf16
      inputs are upcast to f32. Measured on-chip (B=128, T=200, D=H=64)
      bf16 blocks cost 4x — the kernel is latency-bound, not HBM-bound,
      and Mosaic's bf16 (16,128) tile packing forces per-step relayouts of
      blocks narrower than 128 in the minor dim.
    - WIDE towers (D, H multiples of 128, B a multiple of 16): every block is already
      bf16-tile-aligned, so bf16 inputs stay bf16 in VMEM — state, weights
      and the streamed x blocks — with BOTH matmuls accumulating in f32 on
      the MXU (preferred_element_type) and gate math in f32. Biases ride
      in f32 always. Measured on-chip at D=H=512, B=256, T=200 (2026-08-20):
      forward 1.15 -> 1.02 ms (1.13x), fwd+bwd 8.76 -> 7.11 ms (1.23x);
      grad parity vs the XLA bf16 oracle within bf16 noise.
    The boundary casts are linear, so autodiff routes gradients through
    them unchanged; the analytic BPTT always accumulates in f32."""
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
    H3 = w_h.shape[-1]
    b_x_c = (b_x if b_x is not None
             else jnp.zeros(H3, jnp.float32)).astype(jnp.float32)
    b_h_c = (b_h if b_h is not None
             else jnp.zeros(H3, jnp.float32)).astype(jnp.float32)
    ys = _gru_core(x.astype(dtype), h0.astype(dtype), w_x.astype(dtype),
                   w_h.astype(dtype), b_x_c, b_h_c, reset_mask, interpret)
    ys = ys.astype(in_dtype)
    return ys, ys[:, -1]
