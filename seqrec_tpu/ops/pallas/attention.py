"""Blockwise causal flash-attention Pallas kernel (SURVEY.md §2 #6).

SASRec's attention over sessions. O(T) memory: no [T, T] score matrix ever
hits HBM — each (batch*head, q-block) grid cell streams k/v blocks through
VMEM with an online-softmax accumulator (the flash-attention recurrence).

Layout: q/k/v arrive [B, T, N, Dh] (model convention), kernel runs on
[B*N, T, Dh] with grid (B*N, ceil(T/BQ)); the causal structure skips k-blocks
strictly above the diagonal, so the work per q-block is ~half the full sweep.
T is padded to the q/k block size in the wrapper; padded KEYS sit at j >= T
and are masked by causality for all real queries (padded queries produce
garbage rows that the wrapper slices off).

Backward: XLA einsum recompute via custom_vjp — at session lengths (T <=
a few hundred) the [T, T] intermediate is tiny and XLA fuses it well; the
seam for a Pallas backward is the same blocked loop if max_len grows
(SURVEY.md §5.7).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


BQ = 128  # query block rows
BK = 128  # key block rows
NEG_INF = -1e30


def supported(q: jax.Array) -> bool:
    B, T, N, Dh = q.shape
    # Measured on-chip (v5e, bf16, Dh=32, fwd+bwd, fetch-terminated slope —
    # see benchmarks/timing.py): XLA's fused attention wins ~2x at every
    # session length tested (T=200: 0.42 vs 0.93 ms; T=512: 1.37 vs 2.72;
    # T=1024: 5.63 vs 10.09). At recommender head counts (1–2) and short
    # heads the [T, T] scores stay cheap enough that XLA's fusion beats this
    # kernel's pad-to-BQ and block-loop overhead, so the gate is OFF by
    # default. The kernel stays parity-tested as the blockwise/ring-attention
    # seam (SURVEY.md §5.7); opt in via SEQREC_ENABLE_PALLAS_ATTN=1 to
    # re-evaluate on other hardware or at much longer T.
    if os.environ.get("SEQREC_ENABLE_PALLAS_ATTN", "").lower() not in (
        "1", "true", "yes",
    ):
        return False
    return Dh % 8 == 0 and Dh <= 256 and T >= 2 * BQ


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    qi = pl.program_id(1)
    q = q_ref[0]  # [BQ, Dh]
    Dh = q.shape[-1]
    num_k_blocks = qi + 1  # causal: only blocks at or below the diagonal

    q_pos = qi * BQ + lax.broadcasted_iota(jnp.int32, (BQ, BK), 0)

    def body(ki, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(ki * BK, BK)]  # [BK, Dh]
        v = v_ref[0, pl.ds(ki * BK, BK)]  # [BK, Dh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [BQ, BK]
        k_pos = ki * BK + lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)
        s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)  # [BQ, BK]
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    acc = jnp.zeros((BQ, Dh), jnp.float32)
    m0 = jnp.full((BQ, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((BQ, 1), jnp.float32)
    acc, m, l = lax.fori_loop(0, num_k_blocks, body, (acc, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _attn_forward_pallas(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float, interpret: bool
) -> jax.Array:
    """q/k/v: [G, T_pad, Dh] (G = B*N, T_pad % BQ == 0). Returns [G, T_pad, Dh]."""
    G, T_pad, Dh = q.shape
    grid = (G, T_pad // BQ)
    kernel = functools.partial(_attn_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BQ, Dh), lambda g, i: (g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_pad, Dh), lambda g, i: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T_pad, Dh), lambda g, i: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BQ, Dh), lambda g, i: (g, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, T_pad, Dh), q.dtype),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attn_core(q, k, v, scale, interpret):
    return _attn_forward_pallas(q, k, v, scale, interpret)


def _xla_attn_flat(q, k, v, scale):
    """Oracle math on the flattened [G, T, Dh] layout (for the backward)."""
    s = jnp.einsum("gtd,gsd->gts", q, k).astype(jnp.float32) * scale
    T = q.shape[1]
    causal = jnp.tril(jnp.ones((T, T), dtype=bool))
    s = jnp.where(causal[None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("gts,gsd->gtd", p, v)


def _attn_core_fwd(q, k, v, scale, interpret):
    return _attn_forward_pallas(q, k, v, scale, interpret), (q, k, v)


def _attn_core_bwd(scale, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q, k, v: _xla_attn_flat(q, k, v, scale), q, k, v)
    return vjp(g)


_attn_core.defvjp(_attn_core_fwd, _attn_core_bwd)


def causal_attention(
    q: jax.Array,  # [B, T, N, Dh]
    k: jax.Array,
    v: jax.Array,
    *,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in fused version of ops.xla.causal_attention (same semantics)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    B, T, N, Dh = q.shape
    T_pad = ((T + BQ - 1) // BQ) * BQ

    def flat(x):
        x = jnp.swapaxes(x, 1, 2).reshape(B * N, T, Dh)
        if T_pad != T:
            x = jnp.pad(x, ((0, 0), (0, T_pad - T), (0, 0)))
        return x

    out = _attn_core(flat(q), flat(k), flat(v), float(scale), interpret)
    out = out[:, :T].reshape(B, N, T, Dh)
    return jnp.swapaxes(out, 1, 2)  # [B, T, N, Dh]
