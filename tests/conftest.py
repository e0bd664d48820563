"""Test env: CPU backend with 8 fake devices (SURVEY.md §4 sharding tier).

Must run before jax initializes, hence the env mutation at import time.
Pallas kernels run in interpreter mode on CPU (tests pass interpret=True
explicitly); compiled-kernel validation happens on the real TPU chip via
bench.py / the driver's compile check.
"""

import os

# Force CPU: the environment presets JAX_PLATFORMS=axon (the TPU simulator)
# AND its boot hook writes jax.config jax_platforms="axon,cpu", which beats
# the env var — so override the config value itself, before any backend init.
os.environ["JAX_PLATFORMS"] = "cpu"
# ROOT CAUSE of the long-standing rare `Fatal Python error: Aborted` mid-suite
# (VERDICT r3 weak #7), reproduced deterministically with ~300-step fit runs:
# this host has 2 cores, XLA:CPU sizes its worker pool from
# NumSchedulableCPUs(), and an 8-partition collective launch can then
# deadlock its own rendezvous (7 partitions hold pool threads waiting, the
# 8th never gets scheduled; raising the collective timeout just hangs
# forever). TSL honors an NPROC env override for the schedulable-CPU count —
# force the pool to cover the 8 fake devices with slack. Also ~40% faster.
os.environ.setdefault("NPROC", "16")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from seqrec_tpu.data.dataset import SequenceDataset, synthetic_dataset  # noqa: E402


@pytest.fixture(scope="session")
def tiny_ds() -> SequenceDataset:
    """100-user synthetic dataset with bigram structure (no network needed)."""
    return synthetic_dataset(100, 50, seed=7, min_len=5, max_len=30)


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
