"""Train state + optimizer factory (L5).

Mirrors the reference's SGD/Adam + clip Session loop capabilities
(SURVEY.md §2 #21) on optax, with LR schedules and grad-norm clipping.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax

from seqrec_tpu.config import TrainConfig


def decay_mask(params: Any) -> Any:
    """Weight-decay mask: decay only matrices that are not embedding tables.

    Biases and LayerNorm scales (ndim < 2) and the embedding tables (decaying
    a 10M-row table drags every untouched item toward zero each step) are
    excluded — the standard AdamW convention."""

    def leaf_mask(path, leaf) -> bool:
        in_embed = any(
            "embedding" in str(getattr(k, "key", k)) for k in path
        )
        return getattr(leaf, "ndim", 0) >= 2 and not in_embed

    return jax.tree_util.tree_map_with_path(leaf_mask, params)


@flax.struct.dataclass
class TrainState:
    step: jax.Array  # scalar int32
    params: Any
    opt_state: Any
    rng: jax.Array  # PRNG key, folded with step inside the train step
    # Session-parallel mode only: per-layer RNN state carried across packed
    # windows (towers.zero_carry pytree); None otherwise.
    carry: Any = None
    # Sparse-embedding mode only (train.sparse_embedding_update): row-wise
    # optimizer state for the item table (train/sparse_embed.py); the table
    # is then excluded from `opt_state`. None otherwise.
    embed_opt: Any = None


def make_schedule(cfg: TrainConfig) -> optax.Schedule:
    if cfg.lr_schedule == "constant":
        return optax.constant_schedule(cfg.learning_rate)
    if cfg.lr_schedule == "cosine":
        return optax.cosine_decay_schedule(cfg.learning_rate, cfg.num_steps)
    if cfg.lr_schedule == "warmup_cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.learning_rate,
            warmup_steps=cfg.warmup_steps,
            decay_steps=max(cfg.num_steps, cfg.warmup_steps + 1),
        )
    raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")


def make_optimizer(cfg: TrainConfig, *,
                   with_clip: bool = True) -> optax.GradientTransformation:
    """`with_clip=False` is used by the sparse-embedding path, which clips
    the GLOBAL norm (tower grads + sub-table grads) manually before handing
    the tower part to optax — an in-chain clip would see only part of the
    gradient and double-clip."""
    sched = make_schedule(cfg)
    # Split the scaler from the LR step so weight decay can sit between them
    # (decoupled / AdamW placement: decay is lr*wd*param, NOT fed through the
    # adam moments). Scaler hyperparameters match optax.adam/adagrad/sgd.
    if cfg.optimizer == "adam":
        scaler = optax.scale_by_adam()
    elif cfg.optimizer == "adagrad":
        scaler = optax.scale_by_rss(initial_accumulator_value=0.1, eps=1e-7)
    elif cfg.optimizer == "sgd":
        scaler = optax.identity()
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    chain = []
    if with_clip and cfg.grad_clip_norm and cfg.grad_clip_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    chain.append(scaler)
    if cfg.weight_decay and cfg.weight_decay > 0:
        chain.append(
            optax.add_decayed_weights(cfg.weight_decay, mask=decay_mask)
        )
    chain.append(optax.scale_by_learning_rate(sched))
    return optax.chain(*chain)
