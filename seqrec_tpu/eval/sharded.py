"""Sharded full-catalog ranking (SURVEY.md §7.3 item 5).

At 10M-item catalogs the dense eval path ([B, V] logits on one device) is
impossible: B=256 x 10M x 4B = 10 GB. This module computes the only thing the
metrics need — the RANK of each target among all catalog items — with the
score matmul sharded over the mesh's 'model' axis:

    per shard:  local_logits = h @ table_shard.T (+ bias_shard)   [B, V/M]
                target_score += local value if this shard owns target  (psum)
                rank_count   += #{local scores > target_score}         (psum)

No [B, V] array ever exists; collectives move only [B]-sized vectors. The
strictly-greater rank convention matches eval.metrics.ranks_from_scores, and
pad/padded-vocab columns are masked on their owner shard.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from seqrec_tpu.runtime.mesh import MODEL_AXIS

NEG_INF = -1e30


def sharded_ranks(
    table: jax.Array,  # [V, H], sharded P('model', None)
    h: jax.Array,  # [B, H] last-position hidden states (replicated)
    targets: jax.Array,  # [B] target ids
    mesh: Mesh,
    *,
    bias: Optional[jax.Array] = None,  # [V]
    num_valid: Optional[int] = None,  # true vocab (mask padded rows)
    pad_id: int = 0,
    exclude: Optional[jax.Array] = None,  # [B, T] per-row ids to exclude
) -> jax.Array:
    """0-based strictly-greater rank of each target over the full catalog.

    `exclude` (eval.exclude_history): per-row ids whose columns must not
    count — each owner shard subtracts them using ITS OWN logits (the exact
    values the count saw; invalid/pad columns are already NEG_INF there, so
    they never subtract)."""
    V, H = table.shape
    M = mesh.shape[MODEL_AXIS]
    if V % M != 0:
        raise ValueError(f"vocab {V} must divide model shards {M}")
    rows_per_shard = V // M
    nv = num_valid if num_valid is not None else V
    has_bias = bias is not None
    bias_in = bias if has_bias else jnp.zeros((V,), table.dtype)
    if exclude is not None:
        from seqrec_tpu.eval.metrics import first_occurrence_2d

        ex_first_in = first_occurrence_2d(exclude)
    else:
        # Static placeholders keep one shard_map signature.
        exclude = jnp.zeros((h.shape[0], 1), jnp.int32)
        ex_first_in = jnp.zeros((h.shape[0], 1), bool)

    def _local(table_local, bias_local, h_rep, tgt_rep, excl, ex_first):
        shard = jax.lax.axis_index(MODEL_AXIS)
        offset = shard * rows_per_shard
        logits = jnp.einsum(
            "bh,vh->bv", h_rep, table_local.astype(h_rep.dtype)
        ).astype(jnp.float32)
        if has_bias:
            logits = logits + bias_local.astype(jnp.float32)[None, :]
        # Mask pad column + padded-vocab tail on the shard that owns them.
        cols = offset + jnp.arange(rows_per_shard)
        invalid = (cols == pad_id) | (cols >= nv)
        logits = jnp.where(invalid[None, :], NEG_INF, logits)

        # Target score: only the owner shard contributes; psum broadcasts.
        local_t = tgt_rep - offset
        owns = (local_t >= 0) & (local_t < rows_per_shard)
        safe_t = jnp.clip(local_t, 0, rows_per_shard - 1)
        t_score = jnp.take_along_axis(logits, safe_t[:, None], axis=1)[:, 0]
        t_score = jnp.where(owns, t_score, 0.0)
        t_score = jax.lax.psum(t_score, MODEL_AXIS)  # [B]

        greater = jnp.sum(
            (logits > t_score[:, None]).astype(jnp.int32), axis=1
        )

        # Exclude-history correction: subtract excluded columns THIS shard
        # owns, scored from this shard's logits (already NEG_INF at pad /
        # padded-vocab columns, so those never subtract).
        local_e = excl - offset  # [B, T]
        owned_e = (local_e >= 0) & (local_e < rows_per_shard)
        safe_e = jnp.clip(local_e, 0, rows_per_shard - 1)
        s_e = jnp.take_along_axis(logits, safe_e, axis=1)  # [B, T]
        corr = jnp.sum(
            (
                (s_e > t_score[:, None])
                & owned_e
                & ex_first
                & (excl != tgt_rep[:, None])
            ).astype(jnp.int32),
            axis=1,
        )
        return jax.lax.psum(greater - corr, MODEL_AXIS)  # [B]

    fn = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(MODEL_AXIS), P(), P(), P(), P()),
        out_specs=P(),
    )
    return fn(table, bias_in, h, targets.astype(jnp.int32),
              exclude.astype(jnp.int32), ex_first_in)


def sharded_topk(
    table: jax.Array,  # [V, H] sharded P('model', None)
    h: jax.Array,  # [B, H] replicated
    k: int,
    mesh: Mesh,
    *,
    bias: Optional[jax.Array] = None,
    num_valid: Optional[int] = None,
    pad_id: int = 0,
):
    """Global top-k (scores, ids) over the sharded catalog.

    Each shard takes a local top-k, then the k*M candidates are gathered and
    reduced — the classic distributed top-k merge; [B, V] never materializes.
    """
    V, H = table.shape
    M = mesh.shape[MODEL_AXIS]
    if V % M != 0:
        raise ValueError(f"vocab {V} must divide model shards {M}")
    rows_per_shard = V // M
    nv = num_valid if num_valid is not None else V
    has_bias = bias is not None
    bias_in = bias if has_bias else jnp.zeros((V,), table.dtype)

    def _local(table_local, bias_local, h_rep):
        shard = jax.lax.axis_index(MODEL_AXIS)
        offset = shard * rows_per_shard
        logits = jnp.einsum(
            "bh,vh->bv", h_rep, table_local.astype(h_rep.dtype)
        ).astype(jnp.float32)
        if has_bias:
            logits = logits + bias_local.astype(jnp.float32)[None, :]
        cols = offset + jnp.arange(rows_per_shard)
        invalid = (cols == pad_id) | (cols >= nv)
        logits = jnp.where(invalid[None, :], NEG_INF, logits)
        vals, idx = jax.lax.top_k(logits, k)  # [B, k] local
        ids = idx + offset
        # Gather all shards' candidates: [M*k] per row after concat.
        vals_all = jax.lax.all_gather(vals, MODEL_AXIS, axis=1, tiled=True)
        ids_all = jax.lax.all_gather(ids, MODEL_AXIS, axis=1, tiled=True)
        mvals, midx = jax.lax.top_k(vals_all, k)  # [B, k] global
        mids = jnp.take_along_axis(ids_all, midx, axis=1)
        return mvals, mids

    fn = jax.shard_map(
        _local,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(MODEL_AXIS), P()),
        out_specs=(P(), P()),
        # top_k-of-all_gather is replicated over 'model' but the static
        # replication checker can't prove it; values are verified in tests.
        check_vma=False,
    )
    return fn(table, bias_in, h)
