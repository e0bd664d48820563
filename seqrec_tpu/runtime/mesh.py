"""Runtime layer (L0): distributed init, device mesh, host topology.

The reference (SURVEY.md §1b) is a single-process `tf.Session` codebase with
no distributed runtime; this layer is new. Control plane is
`jax.distributed.initialize` (one process per host); the data plane is XLA
collectives over ICI/DCN emitted from pjit shardings and `shard_map`
(SURVEY.md §5.8) — no NCCL/MPI anywhere.

Mesh convention: 2 axes, ``('data', 'model')``.
- ``data``: data parallelism for the sequence tower (grads psum'd by XLA).
- ``model``: row-sharding (tensor parallelism) of embedding tables and of the
  full-catalog scoring matmul.
Batches are sharded over BOTH axes flattened, so every device computes a
distinct micro-batch through the tower; only table rows live on a single
model-shard (SURVEY.md §2.2).
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

logger = logging.getLogger("seqrec")

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. No-op in single-process runs.

    One process per host; process 0 is the coordinator. Safe to call
    unconditionally: if no coordinator address is given and none is in the
    environment, this stays single-process.
    """
    if coordinator_address is None and num_processes is None:
        # Single-process (or env-driven auto-init on real TPU pods).
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )


def make_mesh(
    model_axis: int = 1,
    data_axis: int = -1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create the 2-axis ('data','model') mesh.

    model_axis = number of embedding-table row shards (must divide the device
    count); data_axis = -1 means "all remaining devices".
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model_axis < 1:
        raise ValueError(f"model_axis must be >= 1, got {model_axis}")
    if n % model_axis != 0:
        raise ValueError(f"model_axis={model_axis} must divide device count {n}")
    data = n // model_axis if data_axis == -1 else data_axis
    if data * model_axis != n:
        raise ValueError(
            f"mesh {data}x{model_axis} does not cover {n} devices"
        )
    dev_array = np.asarray(devices).reshape(data, model_axis)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def local_device_count() -> int:
    return jax.local_device_count()
