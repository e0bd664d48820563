"""Recurrent-scan kernel-vs-XLA A/B at shipped widths (r5).

Round 5 discovered the r4 time-unroll commit had silently closed the GRU
kernel's VMEM gate at the wide demo shape (U=4 puts D=512 over the bound),
routing the wide step to XLA — which turned out to be FASTER there: the
"20.4 ms wide-GRU step" committed in r4 was the kernel-path number, and the
XLA-path step measures 11.7–15.5 ms. This benchmark measures kernel vs XLA
scan (fwd+bwd+update chain, bf16 inputs as shipped) PAIRWISE-ALTERNATED at
every shipped recurrent width so the dispatch gate's width cap is set by
same-weather data, not by a VMEM accident.

First committed run (quiet host, 2026-08-21, per-rep ratios kernel-vs-XLA):
see BASELINE.md "Recurrent-scan gate audit". Run:
`python -m benchmarks.scan_ab [gru|lstm ...]`.
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import alternating_chain_slopes_ms
from seqrec_tpu.ops import xla as xla_ops
from seqrec_tpu.ops.pallas import gru as pl_gru
from seqrec_tpu.ops.pallas import lstm as pl_lstm
from seqrec_tpu.runtime import enable_compilation_cache

# (label, B, T, D, n_short, inner) — every distinct recurrent width a
# shipped config or committed demo runs, at its shipped batch/length.
# `inner` = fwd+bwd iterations folded into ONE dispatched chain step:
# sub-ms ops on this relay are DISPATCH-bound (measured: 0.1-0.5 ms/step
# chains swing 2-5x between same-day runs while >=1.4 ms/step chains hold
# to ~1-8%), so each dispatch must carry >= ~1.5 ms of compute for the
# slope to measure the op instead of dispatch-rate weather. Reported ms is
# per single fwd+bwd (slope / inner). n_long = 4*n_short.
GRU_SHAPES = [
    ("ml1m_D64", 128, 200, 64, 100, 8),
    ("session_gru64_T50", 128, 50, 64, 100, 16),
    ("synthetic10m_D128_T50", 256, 50, 128, 100, 8),
    ("beauty_D256_T50", 128, 50, 256, 100, 8),
    ("wide_demo_D512", 256, 200, 512, 50, 1),
]
LSTM_SHAPES = [
    ("ml1m_lstm_D128", 128, 200, 128, 100, 4),
    ("wide_lstm_D512", 256, 200, 512, 50, 1),
]


def _chains_gru(B, T, D, inner=1):
    rng = np.random.default_rng(0)

    def seed():
        return (
            jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16),
            jnp.zeros((B, D), jnp.bfloat16),
            jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.02, jnp.bfloat16),
            jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.02, jnp.bfloat16),
        )

    def make(fn):
        def loss(x, h0, w_x, w_h):
            ys, _ = fn(x, h0, w_x, w_h)
            return jnp.sum(ys.astype(jnp.float32) ** 2) * 1e-6

        grad = jax.value_and_grad(loss, argnums=(0, 2, 3))

        @jax.jit
        def step(carry, _i):
            x, h0, w_x, w_h = carry
            lr = jnp.bfloat16(1e-6)
            for _ in range(inner):  # serially-dependent fwd+bwd iterations
                _, (dx, dwx, dwh) = grad(x, h0, w_x, w_h)
                x = x - lr * dx.astype(x.dtype)
                w_x = w_x - lr * dwx.astype(w_x.dtype)
                w_h = w_h - lr * dwh.astype(w_h.dtype)
            return (x, h0, w_x, w_h)

        return step, seed

    return {"xla": make(xla_ops.gru_scan), "pallas": make(pl_gru.gru_scan)}


def _chains_lstm(B, T, D, inner=1):
    rng = np.random.default_rng(0)

    def seed():
        return (
            jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16),
            jnp.zeros((B, D), jnp.bfloat16),
            jnp.zeros((B, D), jnp.bfloat16),
            jnp.asarray(rng.standard_normal((D, 4 * D)) * 0.02, jnp.bfloat16),
            jnp.asarray(rng.standard_normal((D, 4 * D)) * 0.02, jnp.bfloat16),
        )

    def make(fn):
        def loss(x, h0, c0, w_x, w_h):
            ys, _hc = fn(x, h0, c0, w_x, w_h)
            return jnp.sum(ys.astype(jnp.float32) ** 2) * 1e-6

        grad = jax.value_and_grad(loss, argnums=(0, 3, 4))

        @jax.jit
        def step(carry, _i):
            x, h0, c0, w_x, w_h = carry
            lr = jnp.bfloat16(1e-6)
            for _ in range(inner):  # serially-dependent fwd+bwd iterations
                _, (dx, dwx, dwh) = grad(x, h0, c0, w_x, w_h)
                x = x - lr * dx.astype(x.dtype)
                w_x = w_x - lr * dwx.astype(w_x.dtype)
                w_h = w_h - lr * dwh.astype(w_h.dtype)
            return (x, h0, c0, w_x, w_h)

        return step, seed

    return {"xla": make(xla_ops.lstm_scan),
            "pallas": make(pl_lstm.lstm_scan)}


def run_shape(cell, label, B, T, D, n_short=50, inner=1) -> dict:
    makers = (_chains_gru(B, T, D, inner) if cell == "gru"
              else _chains_lstm(B, T, D, inner))
    mod = pl_gru if cell == "gru" else pl_lstm
    chains = {}
    row = {"cell": cell, "shape": label, "B": B, "T": T, "D": D,
           "inner": inner}
    for name, (step, seed) in makers.items():
        if name == "pallas":
            # The kernel must actually fit: drop the unroll to 1 if the
            # preferred U exceeds the VMEM bound at this width (mirrors
            # what an adaptive gate would pick).
            x, h0 = seed()[0], seed()[1]
            old = mod.UNROLL
            if not mod.supported(x, h0):
                mod.UNROLL = 1
                if not mod.supported(x, h0):
                    mod.UNROLL = old
                    row["pallas_ms"] = "unsupported"
                    continue
            row["pallas_unroll"] = mod._pick_unroll(T)
            try:
                step(seed(), 0)  # trace/compile with the override active
            finally:
                mod.UNROLL = old
        else:
            step(seed(), 0)
        chains[name] = (step, seed)
    if "pallas" not in chains:
        return row
    out = alternating_chain_slopes_ms(chains, n_short=n_short,
                                      n_long=4 * n_short, reps=4)
    for name, (ms, det) in out.items():
        row[f"{name}_ms"] = round(ms / inner, 4)
        row[f"{name}_spread_ms"] = round(det["spread_ms"] / inner, 4)
    pairs = [
        (a, b)
        for a, b in zip(out["xla"][1]["slopes_ms"], out["pallas"][1]["slopes_ms"])
        if a > 0 and b > 0
    ]
    if pairs:
        rs = sorted(a / b for a, b in pairs)
        row["pallas_vs_xla_per_rep"] = {
            "median": round(rs[len(rs) // 2], 3),
            "min": round(rs[0], 3),
            "max": round(rs[-1], 3),
        }
    return row


def main() -> int:
    enable_compilation_cache("~/.cache/seqrec_xla")
    cells = sys.argv[1:] or ["gru", "lstm"]
    for cell in cells:
        shapes = GRU_SHAPES if cell == "gru" else LSTM_SHAPES
        for label, B, T, D, n_short, inner in shapes:
            print(json.dumps(run_shape(cell, label, B, T, D, n_short, inner)),
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
