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
