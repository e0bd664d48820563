"""Sparse (row-wise) embedding updates for large catalogs (L5).

Dense training materializes a [V, D] gradient for the item table every step;
at V=10M, D=128 that is 5 GB of gradient plus matching optimizer-state
traffic — the reason a 10M-item catalog OOMs a 16 GB chip under the normal
path. This module implements the production-recommender alternative, built
from TPU-friendly static-shape ops:

1. collect every item id the step touches (inputs, targets, sampled
   negatives) and take `jnp.unique(..., size=K)` — K is a static budget, so
   the compiled step has fixed shapes;
2. remap each id tensor into sub-table positions with `searchsorted`
   (unique returns a sorted array) and differentiate through the gathered
   [K, D] sub-table — the autodiff cotangent is [K, D], never [V, D];
3. scatter the row updates (and row optimizer-state deltas) back with
   first-occurrence masking so the `fill_value` padding rows of `unique`
   are harmless.

Optimizer semantics vs. the dense path: sgd and adagrad are EXACT (their
state for an untouched row is unchanged by a zero gradient); adam becomes
lazy-adam — untouched rows skip the β-decay of their moments — which is the
standard large-embedding trade (documented, tested for the exact cases).

Formulas mirror optax so the sparse/dense parity test can assert bitwise-
close trajectories: adagrad = optax.scale_by_rss(initial_accumulator_value,
eps) * -lr; adam = optax.scale_by_adam(b1, b2, eps) * -lr with bias
correction by the number of times THIS row was touched (== global step for
the exact-parity optimizers).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from seqrec_tpu.runtime.mesh import MODEL_AXIS

# optax defaults, mirrored (see module docstring).
ADAGRAD_INIT_ACC = 0.1
ADAGRAD_EPS = 1e-7
ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-8

SPARSE_OPTIMIZERS = ("sgd", "adagrad", "adam")


def unique_budget(num_ids: int, table_rows: int) -> int:
    """Static unique-row budget: every id distinct, capped by the table."""
    return min(int(num_ids), int(table_rows))


def collect_unique(ids_concat: jax.Array, budget: int) -> jax.Array:
    """Sorted unique ids padded to `budget`. jit-safe: static output shape.

    jnp.unique places its fill_value padding at the END, which breaks the
    sort order searchsorted depends on (fill 0 after larger ids); re-sorting
    moves the duplicate fill ids to the front, where the leftmost-match rule
    in `remap` and the first-occurrence mask in `row_update` make them
    harmless."""
    return jnp.sort(jnp.unique(ids_concat, size=budget, fill_value=0))


def remap(uids: jax.Array, ids: jax.Array) -> jax.Array:
    """Map original ids to positions in the sorted unique array. With
    duplicates (fill padding) searchsorted returns the leftmost match, so
    padding rows are never referenced."""
    return jnp.searchsorted(uids, ids).astype(jnp.int32)


def remap_capped(uids: jax.Array, ids: jax.Array) -> jax.Array:
    """remap for a CAPPED budget (train.sparse_unique_budget): ids absent
    from `uids` (overflow — the batch touched more distinct rows than the
    budget) map to position K = len(uids), the caller-appended zeros
    sentinel row — NEVER to a neighboring id's row, which is what a plain
    searchsorted would silently do."""
    K = uids.shape[0]
    pos = jnp.searchsorted(uids, ids).astype(jnp.int32)
    safe = jnp.clip(pos, 0, K - 1)
    found = uids[safe] == ids
    return jnp.where(found, safe, K).astype(jnp.int32)


def _first_occurrence_mask(uids: jax.Array) -> jax.Array:
    """[K] 1.0 where this slot is the first occurrence of its id (sorted
    input); the duplicate fill slots get 0 so their scatter contribes vanish."""
    first = jnp.concatenate(
        [jnp.ones((1,), bool), uids[1:] != uids[:-1]]
    )
    return first


def init_row_opt(optimizer: str, table: jax.Array) -> Dict[str, jax.Array]:
    """Optimizer state for the sparse table (full-size, updated row-wise)."""
    if optimizer == "sgd":
        return {}
    if optimizer == "adagrad":
        return {
            "acc": jnp.full(table.shape, ADAGRAD_INIT_ACC, jnp.float32),
        }
    if optimizer == "adam":
        return {
            "m": jnp.zeros(table.shape, jnp.float32),
            "v": jnp.zeros(table.shape, jnp.float32),
        }
    raise ValueError(f"sparse_embedding_update: unsupported optimizer "
                     f"{optimizer!r} (supported: {SPARSE_OPTIMIZERS})")


def row_update(
    optimizer: str,
    lr: jax.Array,
    table: jax.Array,  # [V, D] (or the local [V/M, D] shard, see `indices`)
    row_opt: Dict[str, jax.Array],
    uids: jax.Array,  # [K] sorted unique ids (with fill duplicates)
    g_rows: jax.Array,  # [K, D] gradient of the gathered sub-table
    step: jax.Array,  # scalar int32, 0-based global step
    *,
    indices: Optional[jax.Array] = None,  # [K] scatter rows; default = uids
    extra_valid: Optional[jax.Array] = None,  # [K] extra row mask (sharding)
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Apply one optimizer step to the touched rows only.

    All writes are first-occurrence-masked `.add` deltas, so the duplicate
    fill slots in `uids` contribute exactly zero and scatter order never
    matters. `indices`/`extra_valid` exist for the row-sharded composition
    (sharded_row_update): each shard scatters at LOCAL row offsets and masks
    out ids owned by other shards — a masked slot's delta is exactly zero
    for every optimizer branch below, so clipped indices are harmless."""
    if indices is None:
        indices = uids
    valid = _first_occurrence_mask(uids)
    if extra_valid is not None:
        valid = valid & extra_valid
    valid = valid[:, None].astype(jnp.float32)
    g = g_rows.astype(jnp.float32) * valid

    if optimizer == "sgd":
        upd = (-lr * g).astype(table.dtype)
        return table.at[indices].add(upd), row_opt

    if optimizer == "adagrad":
        acc = row_opt["acc"]
        acc_rows = acc[indices]
        acc_new = acc_rows + g * g
        inv = jnp.where(acc_new > 0, jax.lax.rsqrt(acc_new + ADAGRAD_EPS), 0.0)
        upd = (-lr * g * inv) * valid
        return (
            table.at[indices].add(upd.astype(table.dtype)),
            {"acc": acc.at[indices].add((acc_new - acc_rows) * valid)},
        )

    if optimizer == "adam":
        # Lazy adam: moments of untouched rows keep their values (no decay).
        m, v = row_opt["m"], row_opt["v"]
        m_rows, v_rows = m[indices], v[indices]
        m_new = ADAM_B1 * m_rows + (1.0 - ADAM_B1) * g
        v_new = ADAM_B2 * v_rows + (1.0 - ADAM_B2) * g * g
        t = (step + 1).astype(jnp.float32)
        m_hat = m_new / (1.0 - ADAM_B1 ** t)
        v_hat = v_new / (1.0 - ADAM_B2 ** t)
        upd = (-lr * m_hat / (jnp.sqrt(v_hat) + ADAM_EPS)) * valid
        # Masked slots: m_new - m_rows = (B1-1)*m_rows != 0 even at g=0, so
        # the `valid` factor (not just g-zeroing) is what protects rows owned
        # by other shards / duplicate fill slots.
        return (
            table.at[indices].add(upd.astype(table.dtype)),
            {
                "m": m.at[indices].add((m_new - m_rows) * valid),
                "v": v.at[indices].add((v_new - v_rows) * valid),
            },
        )

    raise ValueError(f"unsupported optimizer {optimizer!r}")


# ---- row-sharded composition (SURVEY.md §7.1 PR 5 × this module) ----------
#
# The flagship large-catalog config (BASELINE.json:11) needs BOTH: the table
# row-sharded over the mesh's 'model' axis (10M x 128 f32 = 5 GB — plus adam
# moments 10 GB — split across shards) AND sparse row-wise updates (no dense
# [V/M, D] gradient per shard either: that would still be 640 MB/step at
# M=8). Composition:
#
#   1. the trainer computes global unique ids [K] (replicated — K is a few
#      10k, trivially small next to the table);
#   2. `sharded_sub_table` fetches the [K, D] sub-table: each shard gathers
#      the rows it owns, zero-fills the rest, and a psum over 'model'
#      assembles the replicated sub-table (ICI cost K*D, the same order as
#      one activation exchange of the dense-sharded path);
#   3. forward/backward differentiate through the REPLICATED sub-table
#      exactly like the single-chip sparse path — the cotangent is [K, D];
#   4. `sharded_row_update` applies the optimizer per shard: ids are shifted
#      to local offsets, rows owned by other shards are masked (delta = 0 at
#      a clipped index), so each table/opt-state row is updated exactly once,
#      on the one shard that owns it.
#
# No dense [V, D] or [V/M, D] gradient ever exists, and steps 2/4 are the
# exact transpose pair of each other by construction.


def sharded_sub_table(table: jax.Array, uids: jax.Array, mesh: Mesh) -> jax.Array:
    """Gather rows `uids` from a P('model', None) row-sharded table.

    Returns the [K, D] sub-table REPLICATED on every device. Pure fetch — the
    caller differentiates w.r.t. the returned sub-table, never through this.
    """
    M = mesh.shape[MODEL_AXIS]
    if M == 1:
        return table[uids]
    if table.shape[0] % M != 0:
        raise ValueError(
            f"table rows {table.shape[0]} must divide model shards {M}; "
            "use parallel.embedding.padded_vocab"
        )
    rows_per = table.shape[0] // M

    def _gather(tl: jax.Array, u: jax.Array) -> jax.Array:
        local = u - jax.lax.axis_index(MODEL_AXIS) * rows_per
        owned = (local >= 0) & (local < rows_per)
        safe = jnp.clip(local, 0, rows_per - 1)
        contrib = jnp.where(owned[:, None], tl[safe], 0)
        return jax.lax.psum(contrib, MODEL_AXIS)

    return jax.shard_map(
        _gather, mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P()), out_specs=P(),
    )(table, uids)


def sharded_row_update(
    optimizer: str,
    lr: jax.Array,
    table: jax.Array,  # [V, D] sharded P('model', None)
    row_opt: Dict[str, jax.Array],  # leaves sharded like the table
    uids: jax.Array,  # [K] replicated sorted unique ids
    g_rows: jax.Array,  # [K, D] replicated sub-table gradient
    step: jax.Array,
    mesh: Mesh,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """row_update for a row-sharded table: each shard updates its own rows."""
    M = mesh.shape[MODEL_AXIS]
    if M == 1:
        return row_update(optimizer, lr, table, row_opt, uids, g_rows, step)
    rows_per = table.shape[0] // M

    def _upd(tl, ro, u, g, lr_, step_):
        local = u - jax.lax.axis_index(MODEL_AXIS) * rows_per
        owned = (local >= 0) & (local < rows_per)
        safe = jnp.clip(local, 0, rows_per - 1)
        return row_update(
            optimizer, lr_, tl, ro, u, g, step_,
            indices=safe, extra_valid=owned,
        )

    shard_spec = P(MODEL_AXIS, None)
    opt_specs = jax.tree.map(lambda _: shard_spec, row_opt)
    return jax.shard_map(
        _upd, mesh=mesh,
        in_specs=(shard_spec, opt_specs, P(), P(), P(), P()),
        out_specs=(shard_spec, opt_specs),
    )(table, row_opt, uids, g_rows, lr, step)


def validate_config(cfg) -> None:
    """Fail fast on option combinations the sparse path does not define.
    `cfg` is the full RunConfig."""
    from seqrec_tpu.models.model import SAMPLED_LOSSES

    t = cfg.train
    problems = []
    if t.optimizer not in SPARSE_OPTIMIZERS:
        problems.append(f"optimizer {t.optimizer!r} not in {SPARSE_OPTIMIZERS}")
    if cfg.model.loss not in SAMPLED_LOSSES:
        problems.append(
            f"loss {cfg.model.loss!r} needs the full table every step; "
            f"sparse updates require one of {SAMPLED_LOSSES}"
        )
    if t.weight_decay and t.weight_decay > 0:
        problems.append("weight_decay would need dense row touches")
    if problems:
        raise ValueError(
            "train.sparse_embedding_update=True is incompatible with: "
            + "; ".join(problems)
        )
