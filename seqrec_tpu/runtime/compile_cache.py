"""Persistent XLA compilation cache (SURVEY.md §7.3 item 3: no compile
stalls; VERDICT r4 missing #4).

On the axon relay a cold compile of one train-step executable costs
40 s–10 min (BENCH_r04 paid 404 s for the K=8 scan executable immediately
before its timed run). JAX's persistent compilation cache serializes
compiled executables to disk keyed by (HLO, backend, flags), so any later
process — including a fresh driver run — deserializes instead of
recompiling. Measured through the relay on-chip 2026-08-21: a 31.8 s cold
compile became 0.69 s in a fresh process with the cache warm (46×); the
write path and the cross-process read path both work through the relay
backend.

Enabled by default via ``train.compilation_cache_dir`` (set "" to disable).
Safe on every backend (CPU tests included): JAX only persists entries whose
compile took >= ``min_compile_time_secs``, so sub-second CPU test compiles
don't churn the directory.
"""

from __future__ import annotations

import logging
import os

import jax

logger = logging.getLogger("seqrec")

_enabled_dir: str = ""


def enable_compilation_cache(
    cache_dir: str, *, min_compile_time_secs: float = 1.0
) -> bool:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Idempotent; empty ``cache_dir`` disables (leaves JAX defaults alone).
    Returns True when the cache is active. Must run before the executables
    it should capture are compiled — Trainer.__init__ calls it before
    building any jitted step.
    """
    global _enabled_dir
    if not cache_dir:
        return False
    # Namespace per backend platform: XLA:CPU AOT entries embed host machine
    # features and the loader is strict about them (observed: a CPU process
    # loading entries written under the relay session logs feature-mismatch
    # errors). Keeping tpu/ and cpu/ entries in separate subdirectories
    # avoids any cross-backend lookup entirely.
    path = os.path.join(
        os.path.abspath(os.path.expanduser(cache_dir)), jax.default_backend()
    )
    if _enabled_dir == path:
        return True
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(min_compile_time_secs),
        )
    except Exception as e:  # config name drift across JAX versions
        logger.warning("compilation cache unavailable: %s", e)
        return False
    _enabled_dir = path
    logger.info("persistent compilation cache: %s", path)
    return True
