"""Wide-GRU step breakdown (VERDICT r4 weak #4 / #6): where do the 20.4 ms
of the D=512 demo go?

BASELINE.md's shape sweep shows the wide-GRU demo (gru4rec D=H=512, B=256,
T=200, sampled S=512, V=10k, adam) at ~20.4 ms/step and 12.1% MFU, with the
serial scan measured at ~7.1 ms (ops/pallas/gru.py wide-bf16 mode) — so
~2/3 of the step lives OUTSIDE the recurrent kernel. This benchmark times
each hot component in isolation with the same fetch-terminated slope method
and commits an additive breakdown:

- ``full``      the compiled train step (fwd+bwd+adam), run_benchmark
- ``scan``      gru_scan fwd+bwd alone via ops.dispatch (the path the real
                step runs — XLA at this width: benchmarks/scan_ab.py r5
                measured XLA 1.66x FASTER than the Pallas kernel at D=512,
                so the gate routes XLA here)
- ``embed``     item-table traffic alone: input gather [N=B*T] + target
                gather [N] + neg gather [S] from the [V, D] table, backward
                scatter-add into a dense [V, D] grad, and an adam-shaped
                elementwise table update (the dense-path cost of tied
                embeddings at this shape)
- ``head``      sampled-softmax head fwd+bwd alone over precomputed
                activations (the path the dispatch gate routes at H=512 —
                XLA today; compare benchmarks/head_sweep.py for the fused
                kernel candidate)

``residual`` = full − (scan + embed + head): optimizer on tower params,
loss scaffolding, fusion interactions. Components overlap slightly (the
head's pos/neg gathers are counted in ``embed``'s pattern too), so the
breakdown is a map, not an audit to the microsecond.

Run on a QUIET host+chip: `python -m benchmarks.wide_profile`.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.throughput import bench_config, run_benchmark
from benchmarks.timing import chain_slope_ms
from seqrec_tpu.ops import dispatch
from seqrec_tpu.ops import xla as xla_ops

B, T, D, S, V = 256, 200, 512, 512, 10_000
N = B * T


def bench_full() -> dict:
    cfg = bench_config(
        arch="gru4rec", batch_size=B, max_len=T, embed_dim=D,
        num_items=V, loss="sampled_softmax", num_negatives=S,
    )
    r = run_benchmark(cfg, steps=48, warmup=5)
    return {"ms": round(r["step_time_ms"], 3),
            "spread_ms": r["spread_ms"], "reliable": r["reliable"]}


def _time(step, seed, n_short=50, n_long=200) -> dict:
    ms, det = chain_slope_ms(step, seed, n_short=n_short, n_long=n_long)
    return {"ms": round(ms, 3), "spread_ms": det["spread_ms"],
            "reliable": det["reliable"]}


def bench_scan() -> dict:
    rng = np.random.default_rng(0)

    def seed():
        x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.bfloat16)
        h0 = jnp.zeros((B, D), jnp.bfloat16)
        w_x = jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.02, jnp.bfloat16)
        w_h = jnp.asarray(rng.standard_normal((D, 3 * D)) * 0.02, jnp.bfloat16)
        return (x, h0, w_x, w_h)

    def loss(x, h0, w_x, w_h):
        ys, _ = dispatch.gru_scan(x, h0, w_x, w_h)
        return jnp.sum(ys.astype(jnp.float32) ** 2) * 1e-6

    grad = jax.value_and_grad(loss, argnums=(0, 2, 3))

    @jax.jit
    def step(carry, _i):
        x, h0, w_x, w_h = carry
        _, (dx, dwx, dwh) = grad(x, h0, w_x, w_h)
        lr = jnp.bfloat16(1e-6)
        return (x - lr * dx.astype(x.dtype), h0,
                w_x - lr * dwx.astype(w_x.dtype),
                w_h - lr * dwh.astype(w_h.dtype))

    return _time(step, seed)


def bench_embed() -> dict:
    """Table gather/scatter/update at the step's id pattern (dense path)."""
    rng = np.random.default_rng(1)
    in_ids = jnp.asarray(rng.integers(1, V, N), jnp.int32)
    tgt_ids = jnp.asarray(rng.integers(1, V, N), jnp.int32)
    neg_ids = jnp.asarray(rng.integers(1, V, S), jnp.int32)
    cot = jnp.asarray(rng.standard_normal((N, D)), jnp.bfloat16)
    cot_neg = jnp.asarray(rng.standard_normal((S, D)), jnp.bfloat16)

    def loss(table):
        a = table[in_ids].astype(jnp.bfloat16)
        b = table[tgt_ids].astype(jnp.bfloat16)
        c = table[neg_ids].astype(jnp.bfloat16)
        # Elementwise contraction against fixed cotangents: backward is a
        # pure scatter-add of [N, D]+[N, D]+[S, D] rows into [V, D].
        return (jnp.sum((a * cot + b * cot).astype(jnp.float32))
                + jnp.sum((c * cot_neg).astype(jnp.float32))) * 1e-6

    grad = jax.grad(loss)

    @jax.jit
    def step(carry, _i):
        table, m, v = carry
        g = grad(table)
        # adam-shaped dense table update (two moments + rsqrt), as the demo
        # config runs it.
        m = 0.9 * m + 0.1 * g
        v = 0.999 * v + 0.001 * g * g
        return (table - 1e-6 * m / (jnp.sqrt(v) + 1e-8), m, v)

    def seed():
        table = jnp.asarray(rng.standard_normal((V, D)) * 0.02, jnp.float32)
        return (table, jnp.zeros((V, D)), jnp.zeros((V, D)))

    return _time(step, seed)


def bench_head() -> dict:
    rng = np.random.default_rng(2)
    targets = jnp.asarray(rng.integers(1, V, N), jnp.int32)
    neg_ids = jnp.asarray(rng.integers(1, V, S), jnp.int32)
    weights = jnp.ones((N,), jnp.float32)
    plq = jnp.zeros((N,), jnp.float32)
    nlq = jnp.zeros((S,), jnp.float32)

    def loss(h, pos, neg):
        s, w = xla_ops.sampled_softmax_loss(
            h, pos, neg, targets, neg_ids, weights,
            pos_log_q=plq, neg_log_q=nlq)
        return s / w

    grad = jax.value_and_grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def step(carry, _i):
        h, pos, neg = carry
        _, (dh, dp, dn) = grad(h, pos, neg)
        lr = jnp.bfloat16(1e-6)
        return (h - lr * dh.astype(h.dtype), pos - lr * dp.astype(pos.dtype),
                neg - lr * dn.astype(neg.dtype))

    def seed():
        k = jax.random.key(3)
        kh, kp, kn = jax.random.split(k, 3)
        return (jax.random.normal(kh, (N, D), jnp.bfloat16),
                jax.random.normal(kp, (N, D), jnp.bfloat16),
                jax.random.normal(kn, (S, D), jnp.bfloat16))

    return _time(step, seed, n_short=200, n_long=800)


def main() -> int:
    from seqrec_tpu.runtime import enable_compilation_cache

    enable_compilation_cache("~/.cache/seqrec_xla")
    out = {"shape": f"gru4rec D={D} B={B} T={T} S={S} V={V} (wide demo)"}
    out["full"] = bench_full()
    out["scan"] = bench_scan()
    out["embed"] = bench_embed()
    out["head"] = bench_head()
    parts = sum(out[k]["ms"] for k in ("scan", "embed", "head"))
    out["residual_ms"] = round(out["full"]["ms"] - parts, 3)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
