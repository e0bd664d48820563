"""Fused sampled-softmax head: tile sweep at SHIPPED shapes (VERDICT r2
task 5 / SURVEY.md §2 #7).

The r1/r2 measurements gated the Pallas head to S >= 1024, which no shipped
sampled-softmax config reaches (max S=512). This sweep times fwd+bwd of the
head at the shapes the shipped configs actually run — ml1m_sasrec /
ml1m_lstm (B=128·T=200 -> N=25600, S=256) and synthetic10m (S=512) — for
the XLA path vs. the Pallas kernel at several row-tile sizes (BN), using
the fetch-terminated slope method. The outcome decides the dispatch gate:
open it where the kernel wins >= 1.2x, otherwise demote honestly in
PARITY.md with these numbers committed.

Run on the chip: `python -m benchmarks.head_sweep`.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.timing import (
    alternating_chain_slopes_ms,
    deltas_distinguishable,
)
from seqrec_tpu.ops import xla as xla_ops
from seqrec_tpu.ops.pallas import softmax_head as pl_head

SHAPES = [
    # (label, N, H, S) — N = B*T of the shipped config
    ("ml1m_sasrec_S256_H64", 25_600, 64, 256),
    ("ml1m_lstm_S256_H128", 25_600, 128, 256),
    ("synthetic10m_S512_H128", 25_600, 128, 512),
    ("gate_check_S1024_H128", 25_600, 128, 1024),
    # ADVICE r3: the S>=512 gate also routes H=256 heads (benchmark-only
    # today — the wide sasrec demo) through the kernel; measure that width
    # at the shipped tile so the gate is backed by data at every H it opens.
    ("gate_check_S512_H256", 25_600, 256, 512),
    # VERDICT r4 weak #3: the wide demos at their TRUE N (B=256·T=200).
    # H=512/S=512 exceeds the VMEM bound at the default BN=1024 tile (the
    # gate is closed there today); the BN=256/512 rows below decide whether
    # an H-adaptive tile should open it.
    ("wide_gru_S512_H512", 51_200, 512, 512),
    ("wide_sasrec_S512_H256", 51_200, 256, 512),
]
TILES = [256, 512, 1024]


def make_step(path: str, bn: int, N: int, H: int, S: int, V: int):
    """Returns a jitted fwd+bwd chain step over (h, pos_emb, neg_emb)."""
    rng = np.random.default_rng(0)
    targets = jnp.asarray(rng.integers(1, V, N), jnp.int32)
    neg_ids = jnp.asarray(rng.integers(1, V, S), jnp.int32)
    weights = jnp.ones((N,), jnp.float32)
    plq = jnp.zeros((N,), jnp.float32)
    nlq = jnp.zeros((S,), jnp.float32)

    if path == "pallas":
        fn = pl_head.sampled_softmax_loss
    else:
        fn = xla_ops.sampled_softmax_loss

    def loss(h, pos, neg):
        s, w = fn(h, pos, neg, targets, neg_ids, weights,
                  pos_log_q=plq, neg_log_q=nlq)
        return s / w

    grad = jax.value_and_grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def step(carry, _i):
        h, pos, neg = carry
        pl_head.BN  # noqa: B018 — documents the trace-time dependency
        _, (dh, dp, dn) = grad(h, pos, neg)
        lr = jnp.bfloat16(1e-6)
        return (h - lr * dh.astype(h.dtype),
                pos - lr * dp.astype(pos.dtype),
                neg - lr * dn.astype(neg.dtype))

    def seed():
        k = jax.random.key(1)
        kh, kp, kn = jax.random.split(k, 3)
        return (
            jax.random.normal(kh, (N, H), jnp.bfloat16),
            jax.random.normal(kp, (N, H), jnp.bfloat16),
            jax.random.normal(kn, (S, H), jnp.bfloat16),
        )

    return step, seed


def main() -> int:
    from seqrec_tpu.runtime import enable_compilation_cache

    enable_compilation_cache("~/.cache/seqrec_xla")
    results = []
    for label, N, H, S in SHAPES:
        V = 100_000
        # All candidates for this shape are timed PAIRWISE-ALTERNATED
        # (DESIGN.md §5 r5 rules): sequential per-candidate blocks let
        # relay drift exceed the XLA-vs-Pallas deltas the gate acts on —
        # observed live: XLA at S512/H256 measured 0.523 ms in a r4 block
        # run and 0.387 ms in a r5 quiet-host run of the same shape.
        chains = {}
        row = {"shape": label, "N": N, "H": H, "S": S}
        chains["xla"] = make_step("xla", 0, N, H, S, V)
        step, seed = chains["xla"]
        step(seed(), 0)  # pre-trace/compile before alternation
        for bn in TILES:
            old = pl_head.BN
            pl_head.BN = bn
            try:
                step, seed = make_step("pallas", bn, N, H, S, V)
                # Trace NOW, while the BN override is set: the jitted step
                # bakes the tile at first call; alternation then reuses the
                # compiled executable.
                step(seed(), 0)
                chains[f"pallas_bn{bn}"] = (step, seed)
            except Exception as e:  # noqa: BLE001 — record, keep sweeping
                row[f"pallas_bn{bn}_ms"] = f"error: {type(e).__name__}"
            finally:
                pl_head.BN = old
        # ~0.1 ms ops: the long/short gap must dwarf relay drift (>50 ms),
        # so chains are 500/2000 steps.
        slopes = alternating_chain_slopes_ms(chains, n_short=500,
                                             n_long=2000, reps=4)
        ms_xla, det = slopes["xla"]
        row["xla_ms"] = round(ms_xla, 4)
        row["xla_spread_ms"] = det["spread_ms"]
        row["xla_reliable"] = det["reliable"]
        xla_reps = det["slopes_ms"]
        for name, (ms, det) in slopes.items():
            if name == "xla":
                continue
            row[f"{name}_ms"] = round(ms, 4)
            row[f"{name}_spread_ms"] = det["spread_ms"]
            row[f"{name}_reliable"] = det["reliable"]
            # SAME-WEATHER per-rep speedup vs XLA: rep r of every candidate
            # ran back-to-back with rep r of XLA, so the ratio within a rep
            # cancels the slow relay drift that inflates the absolute
            # spreads above (each candidate's own reps span the whole
            # multi-minute alternation window). Gate decisions act on the
            # median per-rep ratio and its range — not on absolute spreads.
            pairs = [(x, p) for x, p in zip(xla_reps, det["slopes_ms"])
                     if x > 0 and p > 0]
            if pairs:
                rs = sorted(x / p for x, p in pairs)
                row[f"{name}_vs_xla_per_rep"] = {
                    "median": round(rs[len(rs) // 2], 3),
                    "min": round(rs[0], 3),
                    "max": round(rs[-1], 3),
                }
        best_name = min(
            (k for k in slopes if k != "xla"),
            key=lambda k: slopes[k][0],
            default=None,
        )
        if best_name is not None:
            best = slopes[best_name][0]
            row["best_pallas_over_xla"] = (
                round(ms_xla / best, 3) if best == best else None
            )
            # Conservative cross-window check kept for reference (absolute
            # spreads; usually swallowed by drift — prefer the per-rep
            # ratios above).
            row["distinguishable_from_xla"] = deltas_distinguishable(
                slopes["xla"][1], slopes[best_name][1]
            ) if best == best else False
        results.append(row)
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
