"""Sharded embedding engine (L2, SURVEY.md §2 #2-#3; the hardest correctness
surface per §7.3 item 1).

Row-sharding over the mesh's 'model' axis = tensor parallelism of the lookup
(the rec-sys analog of MoE expert-parallel dispatch, SURVEY.md §2.2). The
exchange uses an all-gather/reduce-scatter pair instead of a capacity-bounded
all-to-all:

    ids  [N_loc]  --all_gather('model')-->  ids_all [M * N_loc]
    contrib = mask_in_range(ids_all) * local_rows[ids_all - shard_offset]
    acts [N_loc, D]  <--psum_scatter('model')--  contrib [M * N_loc, D]

Why this shape: send/recv volumes are fully STATIC (no per-shard ID-count
padding budget to overflow), every id is satisfied by exactly one shard (so
the reduce-scatter sum is exact), and the backward pass is the exact
transpose by construction — jax transposes psum_scatter -> all_gather and
the local gather -> scatter-add, landing each gradient row on the one shard
that owns it. ICI cost per device is N_loc * D for the activation exchange,
identical to the all-to-all scheme's activation leg; the extra all-gather
moves only int32 ids (D× smaller than activations).

The table's leading dim must be divisible by the model-axis size — use
`padded_vocab` when building tables (pad rows are never referenced: real ids
are < true vocab).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from seqrec_tpu.runtime.mesh import DATA_AXIS, MODEL_AXIS


def padded_vocab(vocab_size: int, model_shards: int, multiple: int = 8) -> int:
    """Round vocab up so tables row-shard evenly (and tile nicely)."""
    m = max(model_shards * multiple, multiple)
    return ((vocab_size + m - 1) // m) * m


def sharded_gather(
    table: jax.Array,  # [V, D], sharded P('model', None)
    ids: jax.Array,  # [...], leading dim sharded P(('data','model'))
    mesh: Mesh,
    *,
    dedup: bool = True,
) -> jax.Array:
    """Row-sharded lookup; returns activations with ids' shape + [D]."""
    V, D = table.shape
    M = mesh.shape[MODEL_AXIS]
    if M == 1:
        return jnp.take(table, ids, axis=0)
    if V % M != 0:
        raise ValueError(
            f"vocab {V} must divide model shards {M}; use padded_vocab()"
        )
    rows_per_shard = V // M

    def _lookup(table_local: jax.Array, ids_local: jax.Array) -> jax.Array:
        # table_local: [V/M, D]; ids_local: [B_loc, ...]
        shape = ids_local.shape
        flat = ids_local.reshape(-1)  # [N]
        n = flat.shape[0]

        if dedup:
            # Per-device dedup (SURVEY.md §2 #3): cuts local HBM gather and
            # backward scatter traffic for Zipf-heavy batches. Capacity is
            # full (N) so it is always exact; the win is that duplicate rows
            # hit the table once.
            uniq, inv = jnp.unique(
                flat, size=n, fill_value=0, return_inverse=True
            )
            lookup_ids = uniq
        else:
            lookup_ids = flat

        ids_all = jax.lax.all_gather(
            lookup_ids, MODEL_AXIS, tiled=True
        )  # [M * N]
        my_shard = jax.lax.axis_index(MODEL_AXIS)
        offset = my_shard * rows_per_shard
        local_idx = ids_all - offset
        in_range = (local_idx >= 0) & (local_idx < rows_per_shard)
        safe_idx = jnp.clip(local_idx, 0, rows_per_shard - 1)
        contrib = jnp.take(table_local, safe_idx, axis=0)
        contrib = jnp.where(in_range[:, None], contrib, 0)
        acts = jax.lax.psum_scatter(
            contrib, MODEL_AXIS, scatter_dimension=0, tiled=True
        )  # [N, D]

        if dedup:
            acts = jnp.take(acts, inv.reshape(-1), axis=0)
        return acts.reshape(*shape, D)

    spec_ids = P((DATA_AXIS, MODEL_AXIS), *([None] * (ids.ndim - 1)))
    fn = jax.shard_map(
        _lookup,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), spec_ids),
        out_specs=P((DATA_AXIS, MODEL_AXIS), *([None] * (ids.ndim - 1)), None),
    )
    return fn(table, ids)
