"""Pallas embedding-gather kernel (SURVEY.md §2 #4; TF `GatherV2` analog).

Design: the table stays in HBM (`pl.ANY`); ids are scalar-prefetched so
they are readable before the kernel body runs. Each grid step issues
`ROWS_PER_STEP` independent row DMAs HBM→VMEM (one per gathered id) and
waits on them together — the DMAs overlap each other within the step, and
Mosaic's grid pipeline double-buffers the output block across steps. This
respects TPU tiling rules for arbitrary row indices (a `(1, D)` VMEM block
per row would not: the sublane dim must be a multiple of 8 or the full
array — discovered on-chip, see tests/kernels/test_gather_kernel.py).

Backward: gather's transpose is scatter-add; XLA's segment-sum lowering is
already the right tool on TPU (it is exactly what the dense-path autodiff
produces), wired through custom_vjp.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


ROWS_PER_STEP = 8


def supported(table: jax.Array, ids: jax.Array) -> bool:
    V, D = table.shape
    n = 1
    for s in ids.shape:
        n *= s
    # Measured on-chip (v5e, fp32, V=100k N=25.6k, fwd+bwd, fetch-terminated
    # slope — see benchmarks/timing.py): XLA's gather+scatter wins ~2x even
    # at D=512 (1.34 vs 2.52 ms) — the per-row DMA issue overhead never
    # amortizes against XLA's batched gather, so the gate is OFF by default.
    # The kernel stays parity-tested (it is the template for the sharded
    # lookup's local-gather stage); opt in via SEQREC_ENABLE_PALLAS_GATHER=1
    # to re-evaluate on other hardware. D % 128 is a hard Mosaic constraint
    # (HBM row slices must be lane-tile aligned), not a tuning choice.
    if os.environ.get("SEQREC_ENABLE_PALLAS_GATHER", "").lower() not in (
        "1", "true", "yes",
    ):
        return False
    return D % 128 == 0 and D >= 512 and n >= ROWS_PER_STEP


def _gather_kernel(ids_ref, table_ref, out_ref, sems):
    # table_ref: [V, 1, D] in HBM — the row index is a MAJOR dim, so a
    # 1-row slice is legal regardless of the (8, 128) tile (slicing the
    # second-minor dim by 1 is not; hence the reshape in the wrapper).
    i = pl.program_id(0)
    copies = []
    for j in range(ROWS_PER_STEP):
        row = ids_ref[i * ROWS_PER_STEP + j]
        dma = pltpu.make_async_copy(
            table_ref.at[row], out_ref.at[j], sems.at[j]
        )
        dma.start()
        copies.append(dma)
    for dma in copies:
        dma.wait()


def _gather_pallas(table: jax.Array, flat_ids: jax.Array,
                   interpret: bool = False) -> jax.Array:
    V, D = table.shape
    N = flat_ids.shape[0]
    n_pad = ((N + ROWS_PER_STEP - 1) // ROWS_PER_STEP) * ROWS_PER_STEP
    ids_p = jnp.pad(flat_ids, (0, n_pad - N)).astype(jnp.int32)
    steps = n_pad // ROWS_PER_STEP

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # table in HBM
        out_specs=pl.BlockSpec(
            (ROWS_PER_STEP, 1, D), lambda i, ids: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((ROWS_PER_STEP,))],
    )
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, 1, D), table.dtype),
        interpret=interpret,
    )(ids_p, table.reshape(V, 1, D))
    return out[:N, 0]


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
