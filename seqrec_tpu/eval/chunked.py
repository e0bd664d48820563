"""Chunked full-catalog ranking for large catalogs on a SINGLE device (L6).

The full-protocol metrics need only the target's 0-based rank — the count of
catalog items scoring strictly higher — never the [B, V] score matrix
itself. At V=10M, B=256 that matrix is 10 GB; this module streams the
catalog in fixed blocks through one fori_loop, keeping peak memory at
[B, chunk] (~268 MB at the default chunk), with semantics identical to
`ranks_from_scores(mask_scores(full_logits(...)))`:

- strictly-greater counting (ties rank the target first),
- the pad column and vocab-padding columns (>= num_valid) are excluded,
- a NaN target score ranks LAST (diverged models must not look perfect).

The row-sharded multi-chip analog is eval/sharded.py; this is the
single-device (or replicated-table) path used automatically by the eval
harness when [B, V] would not fit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

DEFAULT_CHUNK = 1 << 18  # [256, 262144] f32 block = 268 MB

# Callers auto-switch to the blockwise paths when [B, V] scores would exceed
# this many bytes. Module-level so tests can shrink it.
CHUNK_THRESHOLD_BYTES = 512 << 20


def chunked_ranks(
    table: jax.Array,  # [V, D] output embedding table
    h: jax.Array,  # [B, D] query vectors (last hidden states)
    targets: jax.Array,  # [B] target item ids
    *,
    bias: Optional[jax.Array] = None,  # [V]
    num_valid: Optional[int] = None,  # exclude columns >= num_valid
    pad_id: int = 0,
    compute_dtype=jnp.bfloat16,
    chunk: int = DEFAULT_CHUNK,
    exclude: Optional[jax.Array] = None,  # [B, T] per-row ids to exclude
) -> jax.Array:  # [B] int32 0-based ranks
    """`exclude` (eval.exclude_history): per-row item ids whose columns must
    not count against the target — semantically identical to
    ranks_from_scores(mask_scores(scores, exclude=...)). Implemented as a
    subtraction INSIDE each block using the block's own logits (the exact
    values the count saw), so no recomputed-score ulp can flip a strict
    comparison."""
    V, D = table.shape
    B = h.shape[0]
    limit = V if num_valid is None else min(num_valid, V)
    chunk = min(chunk, V)
    n_blocks = -(-V // chunk)
    if exclude is not None:
        from seqrec_tpu.eval.metrics import first_occurrence_2d

        ex_first = first_occurrence_2d(exclude)  # [B, T]

    # No padded table copy: at V=10M the [V, D] table is multiple GB and a
    # second copy would defeat this module's purpose. The ragged tail block
    # instead slices at a CLAMPED start (overlapping the previous block) and
    # a block-ownership mask drops the overlap from the count.
    b = None if bias is None else bias.astype(jnp.float32)

    hc = h.astype(compute_dtype)
    # Target scores through the SAME dtype path as the block matmul.
    tgt_emb = table[targets].astype(compute_dtype)
    tgt = jnp.einsum("bd,bd->b", hc, tgt_emb).astype(jnp.float32)
    if b is not None:
        tgt = tgt + b[targets]

    def body(i, counts):
        start = jnp.minimum(i * chunk, V - chunk)
        blk = lax.dynamic_slice_in_dim(table, start, chunk)  # [C, D]
        logits = jnp.einsum(
            "bd,cd->bc", hc, blk.astype(compute_dtype)
        ).astype(jnp.float32)
        cols = start + jnp.arange(chunk)
        if b is not None:
            logits = logits + lax.dynamic_slice_in_dim(b, start, chunk)
        col_ok = (cols >= i * chunk) & (cols != pad_id) & (cols < limit)
        # Exclude the target's own column explicitly: its score here comes
        # from the block matmul while `tgt` came from a row-wise einsum, and
        # a last-ulp difference between the two reductions must not count
        # the target as beating itself.
        not_self = cols[None, :] != targets[:, None]
        gt = logits > tgt[:, None]
        counts = counts + jnp.sum(
            (gt & col_ok[None, :] & not_self).astype(jnp.int32), axis=-1
        )
        if exclude is not None:
            # Subtract excluded columns this block OWNS (same overlap rule as
            # col_ok: id >= i*chunk drops the clamped tail's duplicate span),
            # reading their scores out of THIS block's logits.
            ex_local = exclude - start  # [B, T]
            owned = (
                (exclude >= i * chunk)
                & (ex_local >= 0)
                & (ex_local < chunk)
                & (exclude != pad_id)
                & (exclude < limit)
                & (exclude != targets[:, None])
                & ex_first
            )
            safe_ex = jnp.clip(ex_local, 0, chunk - 1)
            s_ex = jnp.take_along_axis(logits, safe_ex, axis=1)  # [B, T]
            counts = counts - jnp.sum(
                ((s_ex > tgt[:, None]) & owned).astype(jnp.int32), axis=-1
            )
        return counts

    counts = lax.fori_loop(0, n_blocks, body, jnp.zeros((B,), jnp.int32))
    return jnp.where(jnp.isnan(tgt), limit, counts)


def chunked_topk(
    table: jax.Array,  # [V, D]
    h: jax.Array,  # [B, D]
    k: int,
    *,
    bias: Optional[jax.Array] = None,  # [V]
    num_valid: Optional[int] = None,
    pad_id: int = 0,
    compute_dtype=jnp.bfloat16,
    chunk: int = DEFAULT_CHUNK,
):
    """Top-k (values, item ids) over the full catalog without [B, V]:
    per-block top-k merged into a running top-k (serving/batch-inference
    analog of chunked_ranks; eval/sharded.py::sharded_topk is the
    row-sharded counterpart). Blocks stream in ascending id order and the
    merge concatenates the running set first, so ties resolve to the lowest
    item id exactly like a dense lax.top_k."""
    V, D = table.shape
    B = h.shape[0]
    limit = V if num_valid is None else min(num_valid, V)
    chunk = max(min(chunk, V), k)
    n_blocks = -(-V // chunk)
    b = None if bias is None else bias.astype(jnp.float32)
    hc = h.astype(compute_dtype)

    def body(i, carry):
        vals, ids = carry
        start = jnp.minimum(i * chunk, V - chunk)
        blk = lax.dynamic_slice_in_dim(table, start, chunk)
        logits = jnp.einsum(
            "bd,cd->bc", hc, blk.astype(compute_dtype)
        ).astype(jnp.float32)
        cols = start + jnp.arange(chunk)
        if b is not None:
            logits = logits + lax.dynamic_slice_in_dim(b, start, chunk)
        col_ok = (cols >= i * chunk) & (cols != pad_id) & (cols < limit)
        logits = jnp.where(col_ok[None, :], logits, -jnp.inf)
        bvals, bidx = lax.top_k(logits, k)  # [B, k]
        bids = (start + bidx).astype(jnp.int32)
        mvals, midx = lax.top_k(
            jnp.concatenate([vals, bvals], axis=-1), k
        )
        mids = jnp.take_along_axis(
            jnp.concatenate([ids, bids], axis=-1), midx, axis=-1
        )
        return mvals, mids

    init = (
        jnp.full((B, k), -jnp.inf, jnp.float32),
        jnp.zeros((B, k), jnp.int32),
    )
    return lax.fori_loop(0, n_blocks, body, init)
