"""Ranking metrics (L6): recall@k, MRR@k, NDCG@k (SURVEY.md §2 #22).

Rank convention: rank r = number of candidates scored STRICTLY higher than
the target (0 = best). recall@k counts r < k; MRR@k adds 1/(r+1) when r < k;
NDCG@k adds 1/log2(r+2) when r < k. With a single relevant item per user
(leave-one-out protocol) NDCG's ideal DCG is 1, so no normalization term.

All reducers return SUMS + counts so multi-host eval can psum then divide
(SURVEY.md §5.5: metrics are global, not per-host).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def ranks_from_scores(
    scores: jax.Array,  # [B, C] float
    target_idx: jax.Array,  # [B] int — column of the target in `scores`
) -> jax.Array:
    """0-based rank of the target among the candidates (strictly-greater).

    A NaN target score ranks LAST (comparisons with NaN are all false, which
    would otherwise silently rank it first — a diverged model must not look
    perfect).
    """
    tgt = jnp.take_along_axis(scores, target_idx[:, None], axis=-1)  # [B, 1]
    ranks = jnp.sum((scores > tgt).astype(jnp.int32), axis=-1)
    return jnp.where(jnp.isnan(tgt[:, 0]), scores.shape[-1], ranks)


def rank_metrics(
    ranks: jax.Array,  # [B] int
    valid: jax.Array,  # [B] {0,1}
    ks: Sequence[int] = (5, 10, 20),
) -> Dict[str, jax.Array]:
    """Metric SUMS over valid rows + the row count ('count')."""
    v = valid.astype(jnp.float32)
    out: Dict[str, jax.Array] = {"count": jnp.sum(v)}
    r = ranks.astype(jnp.float32)
    for k in ks:
        hit = (ranks < k).astype(jnp.float32) * v
        out[f"recall@{k}"] = jnp.sum(hit)
        out[f"mrr@{k}"] = jnp.sum(hit / (r + 1.0))
        out[f"ndcg@{k}"] = jnp.sum(hit / (jnp.log2(r + 2.0)))
    return out


def finalize_metrics(sums: Dict[str, jax.Array]) -> Dict[str, float]:
    """Divide metric sums by the count (after any cross-host psum)."""
    count = float(sums["count"])
    return {
        k: (float(val) / count if count > 0 else 0.0)
        for k, val in sums.items()
        if k != "count"
    } | {"count": count}


def first_occurrence_2d(x: jax.Array) -> jax.Array:
    """[B, T] bool: True where x[b, t] is the first occurrence of its value
    within row b. Used by the exclude-history rank corrections so duplicate
    history items are discounted exactly once. O(T^2) compare — fine at the
    session lengths this framework targets (T <= a few hundred)."""
    eq = x[:, :, None] == x[:, None, :]  # [B, T, T]
    t = x.shape[1]
    earlier = jnp.tril(jnp.ones((t, t), bool), k=-1)
    return ~jnp.any(eq & earlier[None], axis=2)


def mask_scores(
    scores: jax.Array,  # [B, V]
    *,
    pad_id: int = 0,
    exclude: Optional[jax.Array] = None,  # [B, T] ids to exclude (e.g. history)
) -> jax.Array:
    """Mask the pad column and (optionally) per-row excluded ids to -inf."""
    scores = scores.at[:, pad_id].set(NEG_INF)
    if exclude is not None:
        B = scores.shape[0]
        rows = jnp.arange(B)[:, None]
        # Redirect excluded pad entries onto the pad column (already -inf).
        scores = scores.at[rows, exclude].set(NEG_INF)
    return scores
