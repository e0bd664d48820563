"""Pure-XLA reference implementations of the hot ops.

These are the correctness oracles for the Pallas kernels (SURVEY.md §2.1) and
the production path on CPU / non-TPU backends. They are written to compile to
good XLA regardless: batched matmuls on the MXU, `lax.scan` for recurrence,
no data-dependent shapes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# Embedding gather (TF-C++ GatherV2 analog; SURVEY.md §2 #4)
# ---------------------------------------------------------------------------


def embedding_gather(table: jax.Array, ids: jax.Array) -> jax.Array:
    """Gather rows of `table` ([V, D]) for integer `ids` (any shape).

    Gradient is the scatter-add transpose, handled by XLA.
    """
    return jnp.take(table, ids, axis=0)


# ---------------------------------------------------------------------------
# GRU (TF-C++ GRUBlockCell analog; SURVEY.md §2 #5)
# ---------------------------------------------------------------------------
#
# Layout choice (TPU-first): the input projections x @ W_{r,z,n} for ALL
# timesteps are computed as one big [B*T, 3H] matmul up front (MXU-friendly),
# so the sequential scan only carries the h @ U_{r,z,n} recurrent matmul and
# the VPU gate math. Gate convention matches the standard GRU
# (Cho et al. 2014), with the candidate using r * (h @ U_n) — the
# cuDNN/GRUBlockCell variant ("linear_before_reset"), which is both faster
# (single fused h-matmul) and what the TF reference's GRUCell computes up to
# reset placement; parity tests pin this exact formulation.


def gru_gates(
    x_proj: jax.Array,  # [..., 3H] = x @ W + b (r|z|n blocks)
    h_proj: jax.Array,  # [..., 3H] = h @ U + bh (r|z|n blocks)
    h_prev: jax.Array,  # [..., H]
) -> jax.Array:
    """Fused GRU gate math given precomputed projections. Returns h_next."""
    hidden = h_prev.shape[-1]
    xr, xz, xn = jnp.split(x_proj, 3, axis=-1)
    hr, hz, hn = jnp.split(h_proj, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    del hidden
    return (1.0 - z) * n + z * h_prev


def gru_scan(
    x: jax.Array,  # [B, T, D_in]
    h0: jax.Array,  # [B, H]
    w_x: jax.Array,  # [D_in, 3H]
    w_h: jax.Array,  # [H, 3H]
    b_x: Optional[jax.Array] = None,  # [3H]
    b_h: Optional[jax.Array] = None,  # [3H]
    *,
    reset_mask: Optional[jax.Array] = None,  # [B, T] 1.0 = reset state BEFORE step t
) -> Tuple[jax.Array, jax.Array]:
    """Run a GRU over time. Returns (outputs [B, T, H], final state [B, H]).

    `reset_mask` supports session-parallel batching: where 1, the hidden
    state is zeroed before consuming step t (new session starts).
    """
    B, T, _ = x.shape
    H = h0.shape[-1]
    dtype = x.dtype

    x_proj = jnp.einsum("btd,dh->bth", x, w_x.astype(dtype))
    if b_x is not None:
        x_proj = x_proj + b_x.astype(dtype)

    w_h_c = w_h.astype(dtype)
    b_h_c = b_h.astype(dtype) if b_h is not None else None

    def step(h, inputs):
        if reset_mask is None:
            xp = inputs
        else:
            xp, rm = inputs
            h = h * (1.0 - rm)[:, None]
        h_proj = jnp.dot(h, w_h_c, preferred_element_type=dtype)
        if b_h_c is not None:
            h_proj = h_proj + b_h_c
        h_next = gru_gates(xp, h_proj, h)
        return h_next, h_next

    xs = jnp.swapaxes(x_proj, 0, 1)  # [T, B, 3H] — scan over leading axis
    if reset_mask is not None:
        xs = (xs, jnp.swapaxes(reset_mask.astype(dtype), 0, 1))
    h_last, ys = lax.scan(step, h0.astype(dtype), xs)
    return jnp.swapaxes(ys, 0, 1), h_last


# ---------------------------------------------------------------------------
# LSTM (TF-C++ LSTMBlockCell analog; reference NMT-lineage `unit_type=lstm`)
# ---------------------------------------------------------------------------
#
# Same TPU-first layout as the GRU: all input projections x @ W_{i,f,g,o} are
# one big [B*T, 4H] MXU matmul up front; the sequential scan carries only the
# recurrent matmul h @ U_{i,f,g,o} plus VPU gate math. Gate block order is
# i|f|g|o (cuDNN/LSTMBlockCell convention). No peepholes; forget-gate bias
# offsets belong in the initializer, not the op.


def lstm_gates(
    x_proj: jax.Array,  # [..., 4H] = x @ W + b (i|f|g|o blocks)
    h_proj: jax.Array,  # [..., 4H] = h @ U (i|f|g|o blocks)
    c_prev: jax.Array,  # [..., H]
) -> Tuple[jax.Array, jax.Array]:
    """Fused LSTM gate math given precomputed projections.

    Returns (h_next, c_next)."""
    zi, zf, zg, zo = jnp.split(x_proj + h_proj, 4, axis=-1)
    i = jax.nn.sigmoid(zi)
    f = jax.nn.sigmoid(zf)
    g = jnp.tanh(zg)
    o = jax.nn.sigmoid(zo)
    c_next = f * c_prev + i * g
    h_next = o * jnp.tanh(c_next)
    return h_next, c_next


def lstm_scan(
    x: jax.Array,  # [B, T, D_in]
    h0: jax.Array,  # [B, H]
    c0: jax.Array,  # [B, H]
    w_x: jax.Array,  # [D_in, 4H]
    w_h: jax.Array,  # [H, 4H]
    b: Optional[jax.Array] = None,  # [4H]
    *,
    reset_mask: Optional[jax.Array] = None,  # [B, T] 1.0 = reset BEFORE step t
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Run an LSTM over time.

    Returns (outputs [B, T, H], (h_last, c_last)). `reset_mask` zeroes both
    states before consuming step t (session-parallel batching), mirroring
    gru_scan.
    """
    dtype = x.dtype
    x_proj = jnp.einsum("btd,dh->bth", x, w_x.astype(dtype))
    if b is not None:
        x_proj = x_proj + b.astype(dtype)
    w_h_c = w_h.astype(dtype)

    def step(carry, inputs):
        h, c = carry
        if reset_mask is None:
            xp = inputs
        else:
            xp, rm = inputs
            keep = (1.0 - rm)[:, None]
            h = h * keep
            c = c * keep
        h_proj = jnp.dot(h, w_h_c, preferred_element_type=dtype)
        h_next, c_next = lstm_gates(xp, h_proj, c)
        return (h_next, c_next), h_next

    xs = jnp.swapaxes(x_proj, 0, 1)  # [T, B, 4H]
    if reset_mask is not None:
        xs = (xs, jnp.swapaxes(reset_mask.astype(dtype), 0, 1))
    (h_last, c_last), ys = lax.scan(
        step, (h0.astype(dtype), c0.astype(dtype)), xs
    )
    return jnp.swapaxes(ys, 0, 1), (h_last, c_last)


# ---------------------------------------------------------------------------
# Causal self-attention (SASRec tower; SURVEY.md §2 #6)
# ---------------------------------------------------------------------------


def causal_attention(
    q: jax.Array,  # [B, T, N, Dh]
    k: jax.Array,  # [B, T, N, Dh]
    v: jax.Array,  # [B, T, N, Dh]
    *,
    scale: Optional[float] = None,
) -> jax.Array:
    """Causal multi-head attention, materialized [T, T] scores (oracle).

    Position t attends to positions <= t. Padded positions are handled by the
    caller's masking of outputs/losses (padding lives at the sequence tail in
    our batch layout, so causality alone keeps real steps clean of pad keys).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("btnd,bsnd->bnts", q, k) * scale
    T = q.shape[1]
    causal = jnp.tril(jnp.ones((T, T), dtype=bool))
    logits = jnp.where(causal[None, None, :, :], logits, jnp.finfo(logits.dtype).min)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bnts,bsnd->btnd", probs, v)


# ---------------------------------------------------------------------------
# Scoring heads (TF sampled_softmax_loss analog; SURVEY.md §2 #7, #10-12)
# ---------------------------------------------------------------------------


def full_logits(h: jax.Array, table: jax.Array, bias: Optional[jax.Array] = None) -> jax.Array:
    """Scores vs. the full catalog: [.., H] x [V, H] -> [.., V]."""
    logits = jnp.einsum("...h,vh->...v", h, table.astype(h.dtype))
    if bias is not None:
        logits = logits + bias.astype(h.dtype)
    return logits


def full_softmax_loss(
    h: jax.Array,  # [N, H] hidden states at prediction positions
    table: jax.Array,  # [V, H] output embedding table
    targets: jax.Array,  # [N] target item ids
    weights: jax.Array,  # [N] 0/1 mask (pad exclusion, SURVEY.md §2 #13)
    bias: Optional[jax.Array] = None,
    num_valid: Optional[int] = None,  # mask logit columns >= num_valid (vocab padding)
) -> Tuple[jax.Array, jax.Array]:
    """Masked cross-entropy over the full catalog.

    Returns (sum_loss, sum_weights); caller divides for the mean so the
    normalization can span a psum over hosts.
    """
    logits = full_logits(h, table, bias).astype(jnp.float32)
    if num_valid is not None and num_valid < table.shape[0]:
        cols = jnp.arange(table.shape[0])
        logits = jnp.where(cols[None, :] < num_valid, logits, -1e30)
    logz = jax.nn.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(logits, targets[:, None], axis=-1)[:, 0]
    nll = logz - tgt
    w = weights.astype(jnp.float32)
    return jnp.sum(nll * w), jnp.sum(w)


def sampled_softmax_loss(
    h: jax.Array,  # [N, H]
    pos_emb: jax.Array,  # [N, H] embedding rows of the positive items
    neg_emb: jax.Array,  # [S, H] embedding rows of the shared sampled negatives
    targets: jax.Array,  # [N] positive ids (for accidental-hit removal)
    neg_ids: jax.Array,  # [S] sampled negative ids
    weights: jax.Array,  # [N]
    *,
    pos_log_q: Optional[jax.Array] = None,  # [N] log Q(pos) under the sampler
    neg_log_q: Optional[jax.Array] = None,  # [S] log Q(neg)
) -> Tuple[jax.Array, jax.Array]:
    """Sampled softmax with shared negatives, logQ correction and
    accidental-hit removal (TF `sampled_softmax_loss` semantics,
    SURVEY.md §7.3 item 4).
    """
    pos_logit = jnp.sum(h * pos_emb, axis=-1).astype(jnp.float32)  # [N]
    neg_logit = jnp.einsum("nh,sh->ns", h, neg_emb).astype(jnp.float32)  # [N, S]
    if pos_log_q is not None:
        pos_logit = pos_logit - pos_log_q
    if neg_log_q is not None:
        neg_logit = neg_logit - neg_log_q[None, :]
    # Accidental hits: a sampled negative equal to the positive gets -inf.
    hits = neg_ids[None, :] == targets[:, None]  # [N, S]
    neg_logit = jnp.where(hits, -1e30, neg_logit)
    logits = jnp.concatenate([pos_logit[:, None], neg_logit], axis=-1)
    nll = jax.nn.logsumexp(logits, axis=-1) - pos_logit
    w = weights.astype(jnp.float32)
    # where(): a non-finite nll at a 0-weight (pad) position must not poison
    # the sum (0 * inf = nan).
    return jnp.sum(jnp.where(w > 0, nll, 0.0) * w), jnp.sum(w)


def top1_loss(
    h: jax.Array,  # [N, H]
    pos_emb: jax.Array,  # [N, H]
    neg_emb: jax.Array,  # [S, H]
    targets: jax.Array,  # [N]
    neg_ids: jax.Array,  # [S]
    weights: jax.Array,  # [N]
) -> Tuple[jax.Array, jax.Array]:
    """TOP1 ranking loss (Hidasi et al., ICLR'16 — the GRU4Rec paper's own
    loss): mean_j sigmoid(neg_j - pos) + sigmoid(neg_j^2), the second term a
    built-in score regularizer pushing negative scores toward zero.
    Accidental hits (negative == positive) are excluded from the mean."""
    pos_logit = jnp.sum(h * pos_emb, axis=-1).astype(jnp.float32)  # [N]
    neg_logit = jnp.einsum("nh,sh->ns", h, neg_emb).astype(jnp.float32)  # [N, S]
    hits = neg_ids[None, :] == targets[:, None]  # [N, S]
    per_pair = (
        jax.nn.sigmoid(neg_logit - pos_logit[:, None])
        + jax.nn.sigmoid(neg_logit * neg_logit)
    )
    per_pair = jnp.where(hits, 0.0, per_pair)
    denom = jnp.maximum(jnp.sum(~hits, axis=-1).astype(jnp.float32), 1.0)
    per_pos = jnp.sum(per_pair, axis=-1) / denom
    w = weights.astype(jnp.float32)
    return jnp.sum(jnp.where(w > 0, per_pos, 0.0) * w), jnp.sum(w)


def bpr_max_loss(
    h: jax.Array,  # [N, H]
    pos_emb: jax.Array,  # [N, H]
    neg_emb: jax.Array,  # [S, H]
    targets: jax.Array,  # [N]
    neg_ids: jax.Array,  # [S]
    weights: jax.Array,  # [N]
    *,
    reg: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """BPR-max (Hidasi & Karatzoglou, CIKM'18): softmax-score-weighted BPR
    against the hardest negatives, with softmax-weighted L2 score
    regularization — the loss behind the strong GRU4Rec+ numbers.

    L = -log( sum_j s_j * sigmoid(pos - neg_j) ) + reg * sum_j s_j * neg_j^2,
    where s = softmax(neg logits) over the sample (hits masked out).
    """
    pos_logit = jnp.sum(h * pos_emb, axis=-1).astype(jnp.float32)  # [N]
    neg_logit = jnp.einsum("nh,sh->ns", h, neg_emb).astype(jnp.float32)  # [N, S]
    hits = neg_ids[None, :] == targets[:, None]  # [N, S]
    masked = jnp.where(hits, -1e30, neg_logit)
    s = jax.nn.softmax(masked, axis=-1)  # [N, S]
    p = jnp.sum(s * jax.nn.sigmoid(pos_logit[:, None] - neg_logit), axis=-1)
    nll = -jnp.log(jnp.maximum(p, 1e-12))
    reg_term = reg * jnp.sum(s * neg_logit * neg_logit, axis=-1)
    per_pos = nll + reg_term
    w = weights.astype(jnp.float32)
    return jnp.sum(jnp.where(w > 0, per_pos, 0.0) * w), jnp.sum(w)


def bpr_loss(
    h: jax.Array,  # [N, H]
    pos_emb: jax.Array,  # [N, H]
    neg_emb: jax.Array,  # [S, H]
    targets: jax.Array,  # [N]
    neg_ids: jax.Array,  # [S]
    weights: jax.Array,  # [N]
) -> Tuple[jax.Array, jax.Array]:
    """BPR (Rendle et al. 2009): -log sigmoid(pos - neg), averaged over the
    shared negative set, masked over pad positions (SURVEY.md §2 #12)."""
    pos_logit = jnp.sum(h * pos_emb, axis=-1).astype(jnp.float32)  # [N]
    neg_logit = jnp.einsum("nh,sh->ns", h, neg_emb).astype(jnp.float32)  # [N, S]
    diff = pos_logit[:, None] - neg_logit  # [N, S]
    hits = neg_ids[None, :] == targets[:, None]
    per_pair = -jax.nn.log_sigmoid(diff)
    per_pair = jnp.where(hits, 0.0, per_pair)
    denom = jnp.maximum(jnp.sum(~hits, axis=-1).astype(jnp.float32), 1.0)
    per_pos = jnp.sum(per_pair, axis=-1) / denom
    w = weights.astype(jnp.float32)
    return jnp.sum(jnp.where(w > 0, per_pos, 0.0) * w), jnp.sum(w)
