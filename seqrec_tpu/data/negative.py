"""Negative samplers (L4, SURVEY.md §2 #14) — jit-safe jax implementations.

Distributions over REAL item ids 1..V-1 (0 is pad):

- uniform: each real item equally likely;
- log_uniform: P(rank k) ∝ log((k+2)/(k+1)) over frequency-ordered ids (the
  TF `log_uniform_candidate_sampler` lineage the reference's sampled-softmax
  leaned on). Item ids are assigned by decreasing frequency at prep time, so
  rank == id-1 and this approximates the unigram distribution. Sampling is
  with replacement; accidental hits vs. the positives are removed inside the
  loss (ops.xla.sampled_softmax_loss).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def sample_uniform(key: jax.Array, num: int, vocab_size: int) -> Tuple[jax.Array, jax.Array]:
    """Returns (ids [num], log_q [num]) under the uniform distribution."""
    ids = jax.random.randint(key, (num,), 1, vocab_size, dtype=jnp.int32)
    log_q = jnp.full((num,), -jnp.log(vocab_size - 1.0), dtype=jnp.float32)
    return ids, log_q


def sample_log_uniform(key: jax.Array, num: int, vocab_size: int) -> Tuple[jax.Array, jax.Array]:
    """Zipf-ish sampler: rank k = floor(exp(u*log(R+1)))-1, R = vocab_size-1.

    Returns (ids [num] in [1, vocab_size-1], log_q [num]).
    """
    R = vocab_size - 1  # number of real items
    u = jax.random.uniform(key, (num,), dtype=jnp.float32)
    k = jnp.floor(jnp.exp(u * jnp.log(R + 1.0)) - 1.0).astype(jnp.int32)
    k = jnp.clip(k, 0, R - 1)
    ids = k + 1
    return ids, log_uniform_log_prob(ids, vocab_size)


def log_uniform_log_prob(ids: jax.Array, vocab_size: int) -> jax.Array:
    """log P(id) under the log-uniform sampler (for logQ correction).

    Defined over real ids >= 1; id 0 (pad) is clamped to id 1 so the result
    stays finite — pad positions are masked out of the loss anyway, but an
    inf here would turn 0-weighted terms into NaNs.
    """
    R = vocab_size - 1
    k = (jnp.maximum(ids, 1) - 1).astype(jnp.float32)
    p = jnp.log((k + 2.0) / (k + 1.0)) / jnp.log(R + 1.0)
    return jnp.log(jnp.maximum(p, 1e-30))


def pos_log_prob(ids: jax.Array, vocab_size: int, kind: str) -> jax.Array:
    """log Q(id) of POSITIVE targets under the configured negative sampler
    (the sampled-softmax logQ correction must use the same distribution the
    negatives were drawn from, else training biases toward popular items)."""
    if kind == "uniform":
        return jnp.full(ids.shape, -jnp.log(vocab_size - 1.0), jnp.float32)
    if kind == "log_uniform":
        return log_uniform_log_prob(ids, vocab_size)
    raise ValueError(f"unknown negative sampler {kind!r}")


def sample_negatives(
    key: jax.Array, num: int, vocab_size: int, kind: str
) -> Tuple[jax.Array, jax.Array]:
    if kind == "uniform":
        return sample_uniform(key, num, vocab_size)
    if kind == "log_uniform":
        return sample_log_uniform(key, num, vocab_size)
    raise ValueError(f"unknown negative sampler {kind!r}")
