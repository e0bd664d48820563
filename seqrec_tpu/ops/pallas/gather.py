"""Pallas embedding-gather kernel (SURVEY.md §2 #4; TF `GatherV2` analog).

Design: ids are scalar-prefetched (available before the kernel body runs), so
each grid step's BlockSpec index_map points the pipeline at the table row the
step needs — Mosaic's grid pipeline then double-buffers the HBM->VMEM row
DMAs automatically, overlapping the fetch of row i+1 with the copy-out of
row i. `ROWS_PER_STEP` rows ride each grid step (one in_spec per slot) to
keep several DMAs in flight.

Backward: gather's transpose is scatter-add; XLA's segment-sum lowering is
already the right tool on TPU (and is exactly what the dense-path autodiff
produces), wired through custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from seqrec_tpu.ops import xla as xla_ops

ROWS_PER_STEP = 8


def supported(table: jax.Array, ids: jax.Array) -> bool:
    V, D = table.shape
    n = 1
    for s in ids.shape:
        n *= s
    # Worth a kernel only for reasonably wide rows; tiny lookups are faster
    # through XLA's fused gather.
    return D % 128 == 0 and n >= ROWS_PER_STEP


def _gather_kernel(ids_ref, *refs):
    out_ref = refs[-1]
    for j in range(ROWS_PER_STEP):
        out_ref[j] = refs[j][0]


def _gather_pallas(table: jax.Array, flat_ids: jax.Array,
                   interpret: bool = False) -> jax.Array:
    V, D = table.shape
    N = flat_ids.shape[0]
    n_pad = ((N + ROWS_PER_STEP - 1) // ROWS_PER_STEP) * ROWS_PER_STEP
    ids_p = jnp.pad(flat_ids, (0, n_pad - N)).astype(jnp.int32)
    steps = n_pad // ROWS_PER_STEP

    def make_spec(j):
        return pl.BlockSpec(
            (1, D),
            lambda i, ids: (ids[i * ROWS_PER_STEP + j], 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[make_spec(j) for j in range(ROWS_PER_STEP)],
        out_specs=pl.BlockSpec(
            (ROWS_PER_STEP, D), lambda i, ids: (i, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, D), table.dtype),
        interpret=interpret,
    )(ids_p, *([table] * ROWS_PER_STEP))
    return out[:N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gather_core(table, flat_ids, interpret):
    return _gather_pallas(table, flat_ids, interpret)


def _gather_core_fwd(table, flat_ids, interpret):
    # Saving `table` costs nothing extra: params outlive the step anyway and
    # the bwd only reads its shape/dtype (zeros_like does not touch data).
    return _gather_pallas(table, flat_ids, interpret), (table, flat_ids)


def _gather_core_bwd(interpret, res, g):
    table, flat_ids = res
    d_table = jnp.zeros_like(table).at[flat_ids].add(g.astype(table.dtype))
    return d_table, None


_gather_core.defvjp(_gather_core_fwd, _gather_core_bwd)


def embedding_gather(table: jax.Array, ids: jax.Array, *,
                     interpret: bool = False) -> jax.Array:
    """Drop-in fused version of ops.xla.embedding_gather."""
    flat = ids.reshape(-1)
    out = _gather_core(table, flat, interpret)
    return out.reshape(*ids.shape, table.shape[-1])
