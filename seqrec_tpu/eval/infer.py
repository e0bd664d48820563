"""Batch inference (the reference `inference.py` role, SURVEY.md §1b/§3.2):
score user histories and emit top-k next-item recommendations.

Used by the `recommend` CLI subcommand: histories come in as JSON lines
(`{"user": optional id, "history": [item ids...]}`), recommendations go out
as JSON lines with the top-k item ids + scores. Batches are padded to a
fixed shape so the scoring step compiles once; the sharded top-k path is
used automatically when the catalog is row-sharded.
"""

from __future__ import annotations

from typing import Dict, Iterable, Iterator, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from seqrec_tpu.eval.chunked import CHUNK_THRESHOLD_BYTES
from seqrec_tpu.eval.metrics import mask_scores

# Compiled-step cache: recommend() is called per request batch in serving;
# a fresh @jax.jit closure per call would re-trace + re-compile every time
# (40 s-10 min per compile on the relay). Same LRU-bounded scheme as
# eval/harness.py: a serving process that rebuilds models must not leak one
# compiled step per model forever.
from collections import OrderedDict

from seqrec_tpu.eval.harness import lru_get, lru_put

_STEP_CACHE: "OrderedDict[tuple, object]" = OrderedDict()


def _cached_topk_step(model, fetch_k, use_sharded, use_chunked, mesh, chunk):
    key = (model, fetch_k, use_sharded, use_chunked,
           mesh if use_sharded else None, chunk)
    hit = lru_get(_STEP_CACHE, key)
    if hit is not None:
        return hit

    @jax.jit
    def step(params, inputs, mask, users):
        if use_sharded or use_chunked:
            h_last = model.apply(params, inputs, mask, users=users,
                                 method=model.last_hidden)
            table = model.apply(params, method=model.output_table)
            bias = model.apply(params, method=model.output_bias_value)
            if use_sharded:
                from seqrec_tpu.eval.sharded import sharded_topk

                return sharded_topk(
                    table, h_last.astype(jnp.float32), fetch_k, mesh,
                    bias=bias, num_valid=model.vocab_size,
                )
            from seqrec_tpu.eval.chunked import chunked_topk

            return chunked_topk(
                table, h_last, fetch_k, bias=bias,
                num_valid=model.vocab_size,
                compute_dtype=model.compute_dtype,
                chunk=chunk,
            )
        scores = model.apply(params, inputs, mask, users=users,
                             method=model.scores)
        scores = mask_scores(scores)
        return jax.lax.top_k(scores, fetch_k)

    lru_put(_STEP_CACHE, key, step)
    return step


def _pack(
    histories: Sequence[Sequence[int]],
    users: Sequence[int],
    batch_size: int,
    max_len: int,
):
    B = batch_size
    inputs = np.zeros((B, max_len), np.int32)
    mask = np.zeros((B, max_len), np.float32)
    u = np.zeros((B,), np.int32)
    for r, h in enumerate(histories):
        h = list(h)[-max_len:]
        inputs[r, : len(h)] = h
        mask[r, : len(h)] = 1.0
        u[r] = users[r]
    return inputs, mask, u


def recommend(
    model,
    params,
    histories: Iterable[Dict],
    *,
    k: int = 10,
    batch_size: int = 64,
    max_len: int = 200,
    mesh=None,
    exclude_history: bool = True,
    chunk: int | None = None,
) -> Iterator[Dict]:
    """Yield {"user", "items", "scores"} per input history dict (in order).

    `chunk` sets the catalog block size on the chunked-topk path; None reads
    eval.chunked.DEFAULT_CHUNK at call time (so tests can patch it)."""
    use_sharded = bool(
        mesh is not None
        and getattr(model, "shard_embeddings", False)
        and mesh.shape.get("model", 1) > 1
    )
    # Large single-device catalogs: stream blockwise top-k instead of
    # materializing [B, V] scores (same auto rule as the eval harness).
    table_rows = getattr(model, "table_size", None) or model.vocab_size
    use_chunked = (not use_sharded
                   and 4 * batch_size * table_rows > CHUNK_THRESHOLD_BYTES)
    # Over-fetch so host-side history exclusion cannot empty the list.
    fetch_k = min(k + (max_len if exclude_history else 0),
                  model.vocab_size - 1)
    from seqrec_tpu.eval import chunked as chunked_mod

    step = _cached_topk_step(
        model, fetch_k, use_sharded, use_chunked, mesh,
        chunk if chunk is not None else chunked_mod.DEFAULT_CHUNK,
    )

    pending: List[Dict] = []

    def flush() -> Iterator[Dict]:
        hs = [p.get("history", []) for p in pending]
        us = [int(p.get("user", 0)) for p in pending]
        while len(hs) < batch_size:
            hs.append([])
            us.append(0)
        inputs, mask, u = _pack(hs, us, batch_size, max_len)
        vals, ids = step(params, jnp.asarray(inputs), jnp.asarray(mask),
                         jnp.asarray(u))
        vals = np.asarray(jax.device_get(vals))
        ids = np.asarray(jax.device_get(ids))
        for r, p in enumerate(pending):
            seen = (
                {int(x) for x in p.get("history", [])}
                if exclude_history else set()
            )
            items: List[int] = []
            scores: List[float] = []
            for i, v in zip(ids[r], vals[r]):
                if int(i) in seen:
                    continue
                items.append(int(i))
                scores.append(float(v))
                if len(items) == k:
                    break
            yield {"user": p.get("user"), "items": items, "scores": scores}
        pending.clear()

    for rec in histories:
        pending.append(rec)
        if len(pending) == batch_size:
            yield from flush()
    if pending:
        yield from flush()
