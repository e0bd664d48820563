"""Fused sampled-softmax head Pallas kernel (SURVEY.md §2 #7; TF
`sampled_softmax_loss` analog).

Fuses, per tile of N scoring positions: the [BN, H] x [H, S] negative-logit
matmul (MXU), logQ correction, accidental-hit masking, logsumexp and the
per-row NLL — without ever writing the [N, S] logit matrix to HBM (the XLA
fallback materializes it; at N = B*T ~ 25k, S = 256+ that is tens of MB per
step). Negatives (S rows of the table) stay resident in VMEM across the grid.

Backward: XLA recompute via custom_vjp — the same einsums, but XLA fuses the
softmax recompute into the two backward matmuls; measured step-level wins come
from the forward fusion (memory), not the backward FLOPs.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN: Optional[int] = None  # rows per grid step; None = auto (_row_tile)
NEG_INF = -1e30


def _row_tile(S: int, H: int = 128) -> int:
    """Rows per grid step. Measured on-chip (v5e, N=25600, fwd+bwd chains,
    benchmarks/head_sweep.py): at S=512/H≤128 the tall 1024-row tile is
    best (r4: 0.112 ms vs 0.140 at BN=256); at H=256 the [BN, H] blocks eat
    the VMEM the negatives need, and BN=512 wins (r5 alternated per-rep
    1.215x vs 1.075x at BN=1024); at S≥1024 the [BN, S] block dominates so
    the shorter tile wins. BN (module-level) overrides for sweeps."""
    if BN is not None:
        return BN
    if S > 512:
        return 256
    return 1024 if H <= 128 else 512


def supported(h: jax.Array, neg_emb: jax.Array) -> bool:
    N, H = h.shape
    S = neg_emb.shape[0]
    # The gate opens at S >= 512 and H <= 256. Every (H, S) class it routes
    # has a committed measurement (benchmarks/head_sweep.py; r5 numbers are
    # PAIRWISE-ALTERNATED same-weather per-rep ratios — DESIGN.md §5):
    #   S=512/H=64..128 (shipped synthetic10m head): 2.2x (r4, BN=1024);
    #     r5 quiet-host sequential 1.68x, alternated median 1.6-1.8x.
    #   S=512/H=256 (wide-sasrec demo): 1.215x at BN=512 (r5 alternated,
    #     range 0.95-1.26; r4 sequential said 1.37x at BN=1024 — the tile
    #     choice moved under same-weather data, the win did not).
    #   S=1024/H=128: parity (r5 alternated 1.004, spread 1%; r4: 1.008) —
    #     open is harmless, kept for the S-adaptive tile's coverage.
    # Explicitly NOT routed:
    #   H=512 (wide-GRU demo head): measured EXACT parity at every tile
    #     (r5 alternated medians 1.003/1.003/1.008, spreads <2%) — XLA
    #     already blocks/fuses this shape optimally; routing buys nothing.
    #   S=256 (ml1m/beauty/rsc15-sampled heads): XLA parity or better
    #     (r4: H=64 0.133 both, H=128 0.110 XLA vs 0.115).
    #   bpr_max S=2048: stays XLA by memory_analysis evidence (70.5 MB
    #     temp — no [N, S] pair materializes; BASELINE.md).
    # Step-level cross-checks (full-train-step alternated A/Bs, r5): the
    # S=256 exclusion holds in-step (forcing the kernel into the headline
    # ml1m step costs 14%); the S=512/H=128 inclusion is in-step parity at
    # the shipped synthetic10m shape (the head is ~15% of that step, so
    # the isolated win is inside step-level weather) — open by isolated
    # measurement, harmless by step measurement.
    # neg_emb + per-tile blocks must also fit comfortably in VMEM.
    bn = _row_tile(S, H)
    vmem = 4 * (S * H + bn * (2 * H + 2 * S))
    return (H % 8 == 0 and S % 8 == 0 and S >= 512 and H <= 256
            and vmem < 8 * 1024 * 1024)


def _head_kernel(h_ref, pos_ref, neg_ref, tgt_ref, negid_ref, plogq_ref,
                 nlogq_ref, nll_ref):
    # Vector operands travel as 2-D blocks: [BN, 1] per-row, [1, S] per-neg.
    h = h_ref[:]  # [BN, H]
    pos = pos_ref[:]  # [BN, H]
    neg = neg_ref[:]  # [S, H]
    pos_logit = (
        jnp.sum(h.astype(jnp.float32) * pos.astype(jnp.float32), axis=-1,
                keepdims=True)
        - plogq_ref[:]
    )  # [BN, 1]
    s = lax.dot_general(
        h, neg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) - nlogq_ref[:]  # [BN, S] (- [1, S] broadcasts)
    hits = negid_ref[:] == tgt_ref[:]  # [1,S] == [BN,1] -> [BN, S]
    s = jnp.where(hits, NEG_INF, s)
    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), pos_logit)  # [BN, 1]
    lse = m + jnp.log(
        jnp.sum(jnp.exp(s - m), axis=-1, keepdims=True)
        + jnp.exp(pos_logit - m)
    )
    nll_ref[:] = lse - pos_logit


def _head_pallas(h, pos_emb, neg_emb, targets, neg_ids, pos_log_q, neg_log_q,
                 interpret=False):
    N, H = h.shape
    S = neg_emb.shape[0]
    bn = _row_tile(S, H)
    n_pad = ((N + bn - 1) // bn) * bn
    pad = n_pad - N
    if pad:
        h = jnp.pad(h, ((0, pad), (0, 0)))
        pos_emb = jnp.pad(pos_emb, ((0, pad), (0, 0)))
        targets = jnp.pad(targets, (0, pad))
        pos_log_q = jnp.pad(pos_log_q, (0, pad))
    grid = (n_pad // bn,)
    nll = pl.pallas_call(
        _head_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        interpret=interpret,
    )(h, pos_emb, neg_emb, targets[:, None], neg_ids[None, :],
      pos_log_q[:, None], neg_log_q[None, :])
    return nll[:N, 0]


def _nll_xla(h, pos_emb, neg_emb, targets, neg_ids, pos_log_q, neg_log_q):
    pos_logit = jnp.sum(h * pos_emb, axis=-1).astype(jnp.float32) - pos_log_q
    neg_logit = (
        jnp.einsum("nh,sh->ns", h, neg_emb).astype(jnp.float32)
        - neg_log_q[None, :]
    )
    hits = neg_ids[None, :] == targets[:, None]
    neg_logit = jnp.where(hits, NEG_INF, neg_logit)
    logits = jnp.concatenate([pos_logit[:, None], neg_logit], axis=-1)
    return jax.nn.logsumexp(logits, axis=-1) - pos_logit


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _head_core(h, pos_emb, neg_emb, targets, neg_ids, pos_log_q, neg_log_q,
               interpret):
    return _head_pallas(h, pos_emb, neg_emb, targets, neg_ids, pos_log_q,
                        neg_log_q, interpret)


def _head_core_fwd(h, pos_emb, neg_emb, targets, neg_ids, pos_log_q,
                   neg_log_q, interpret):
    out = _head_pallas(h, pos_emb, neg_emb, targets, neg_ids, pos_log_q,
                       neg_log_q, interpret)
    return out, (h, pos_emb, neg_emb, targets, neg_ids, pos_log_q, neg_log_q)


def _head_core_bwd(interpret, res, g):
    h, pos_emb, neg_emb, targets, neg_ids, pos_log_q, neg_log_q = res
    _, vjp = jax.vjp(
        lambda h, p, n: _nll_xla(h, p, n, targets, neg_ids, pos_log_q,
                                 neg_log_q),
        h, pos_emb, neg_emb,
    )
    dh, dpos, dneg = vjp(g)
    return dh, dpos, dneg, None, None, None, None


_head_core.defvjp(_head_core_fwd, _head_core_bwd)


def sampled_softmax_loss(
    h: jax.Array,  # [N, H]
    pos_emb: jax.Array,  # [N, H]
    neg_emb: jax.Array,  # [S, H]
    targets: jax.Array,  # [N]
    neg_ids: jax.Array,  # [S]
    weights: jax.Array,  # [N]
    *,
    pos_log_q: Optional[jax.Array] = None,
    neg_log_q: Optional[jax.Array] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in fused version of ops.xla.sampled_softmax_loss."""
    N = h.shape[0]
    S = neg_emb.shape[0]
    plq = pos_log_q if pos_log_q is not None else jnp.zeros(N, jnp.float32)
    nlq = neg_log_q if neg_log_q is not None else jnp.zeros(S, jnp.float32)
    nll = _head_core(
        h, pos_emb, neg_emb, targets.astype(jnp.int32),
        neg_ids.astype(jnp.int32), plq.astype(jnp.float32),
        nlq.astype(jnp.float32), interpret,
    )
    w = weights.astype(jnp.float32)
    return jnp.sum(jnp.where(w > 0, nll, 0.0) * w), jnp.sum(w)
