"""Per-op dispatch between Pallas TPU kernels and XLA fallbacks.

Pallas kernels are used when (a) the caller asked for them
(``use_pallas=True``) and (b) the default backend is TPU. Everything else
(CPU tests, debugging) takes the XLA oracle path. Kernel parity tests compare
the two directly (SURVEY.md §4 kernel tier).
"""

from __future__ import annotations

import functools
import os

import jax

from seqrec_tpu.ops import xla as xla_ops


@functools.cache
def pallas_supported() -> bool:
    """True when the default backend can run compiled Mosaic kernels."""
    if os.environ.get("SEQREC_FORCE_XLA_OPS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def _op_disabled(op: str) -> bool:
    """Per-op kill switch for A/B attribution: SEQREC_DISABLE_PALLAS_OPS is a
    comma list of {gather,gru,lstm,attn,head}."""
    disabled = os.environ.get("SEQREC_DISABLE_PALLAS_OPS", "")
    return op in {s.strip() for s in disabled.split(",") if s.strip()}


def _use_pallas(flag: bool, op: str = "") -> bool:
    return bool(flag) and pallas_supported() and not _op_disabled(op)


def embedding_gather(table, ids, *, use_pallas: bool = True):
    if _use_pallas(use_pallas, "gather"):
        from seqrec_tpu.ops.pallas import gather as pl_gather

        if pl_gather.supported(table, ids):
            return pl_gather.embedding_gather(table, ids)
    return xla_ops.embedding_gather(table, ids)


def gru_scan(x, h0, w_x, w_h, b_x=None, b_h=None, *, reset_mask=None,
             use_pallas: bool = True):
    if _use_pallas(use_pallas, "gru"):
        from seqrec_tpu.ops.pallas import gru as pl_gru

        if pl_gru.supported(x, h0):
            return pl_gru.gru_scan(x, h0, w_x, w_h, b_x, b_h,
                                   reset_mask=reset_mask)
    return xla_ops.gru_scan(x, h0, w_x, w_h, b_x, b_h, reset_mask=reset_mask)


def lstm_scan(x, h0, c0, w_x, w_h, b=None, *, reset_mask=None,
              use_pallas: bool = True):
    if _use_pallas(use_pallas, "lstm"):
        from seqrec_tpu.ops.pallas import lstm as pl_lstm

        if pl_lstm.supported(x, h0):
            return pl_lstm.lstm_scan(x, h0, c0, w_x, w_h, b,
                                     reset_mask=reset_mask)
    return xla_ops.lstm_scan(x, h0, c0, w_x, w_h, b, reset_mask=reset_mask)


def causal_attention(q, k, v, *, scale=None, use_pallas: bool = True):
    if _use_pallas(use_pallas, "attn"):
        from seqrec_tpu.ops.pallas import attention as pl_attn

        if pl_attn.supported(q):
            return pl_attn.causal_attention(q, k, v, scale=scale)
    return xla_ops.causal_attention(q, k, v, scale=scale)


def sampled_softmax_loss(h, pos_emb, neg_emb, targets, neg_ids, weights, *,
                         pos_log_q=None, neg_log_q=None,
                         use_pallas: bool = True):
    if _use_pallas(use_pallas, "head"):
        from seqrec_tpu.ops.pallas import softmax_head as pl_head

        if pl_head.supported(h, neg_emb):
            return pl_head.sampled_softmax_loss(
                h, pos_emb, neg_emb, targets, neg_ids, weights,
                pos_log_q=pos_log_q, neg_log_q=neg_log_q,
            )
    return xla_ops.sampled_softmax_loss(
        h, pos_emb, neg_emb, targets, neg_ids, weights,
        pos_log_q=pos_log_q, neg_log_q=neg_log_q,
    )
