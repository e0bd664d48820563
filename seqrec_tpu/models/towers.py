"""Sequence towers (L3): GRU4Rec-style recurrent and SASRec-style causal
self-attention encoders.

Both map embedded item sequences [B, T, D] -> per-step hidden states
[B, T, H] where position t encodes the prefix items[0..t] and is used to
score the next item (SURVEY.md §3.3). Towers are deliberately thin flax
modules over the fused ops in `seqrec_tpu.ops` so the hot path is a single
kernel (Pallas) or a tight XLA loop, not module soup.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from seqrec_tpu import ops


def zero_carry(cell: str, num_layers: int, batch: int, hidden: int,
               dtype=jnp.float32):
    """Fresh recurrent state for a session-parallel stream: per-layer h for
    GRU, (h, c) for LSTM. Shape [batch, hidden] per leaf."""
    z = lambda: jnp.zeros((batch, hidden), dtype)  # noqa: E731
    if cell == "gru":
        return tuple(z() for _ in range(num_layers))
    return tuple((z(), z()) for _ in range(num_layers))


def _lstm_bias_init(key, shape, dtype):
    """Forget-gate bias +1 (i|f|g|o block order): the standard LSTM init that
    keeps the cell remembering early in training (Jozefowicz et al. 2015)."""
    b = jnp.zeros(shape, dtype)
    H = shape[0] // 4
    return b.at[H:2 * H].set(1.0)


class RNNTower(nn.Module):
    """Stacked recurrent encoder (GRU4Rec; Hidasi et al., ICLR'16 lineage).

    `cell` selects the recurrence: "gru" (default; GRU4Rec proper) or "lstm"
    (the reference's NMT-lineage `unit_type=lstm` hparam). num_layers cells
    with optional inter-layer dropout; hidden size `hidden` per layer.
    Initial state is zeros (sessions start fresh each batch row — batch
    layout is one session/user-sequence per row). `residual` adds the layer
    input back to its output when widths match (NMT-lineage `residual`
    hparam for deep stacks).
    """

    hidden: int
    num_layers: int = 1
    dropout_rate: float = 0.0
    cell: str = "gru"
    residual: bool = False
    use_pallas: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array, *,
                 carry=None, reset: jax.Array = None,
                 deterministic: bool = True):
        """Encode [B, T, D] -> [B, T, H].

        `carry`/`reset` enable session-parallel streaming (truncated BPTT):
        `carry` is the per-layer state from the previous window (see
        `zero_carry`), `reset` [B, T] marks positions where a new session
        starts (state zeroed BEFORE consuming them). When `carry` is given
        the return is (outputs, new_carry); otherwise outputs alone.
        """
        if self.cell not in ("gru", "lstm"):
            raise ValueError(f"unknown rnn cell {self.cell!r}")
        B, T, _ = x.shape
        gates = 3 if self.cell == "gru" else 4
        h = x
        new_carry = []
        for layer in range(self.num_layers):
            d_in = h.shape[-1]
            w_x = self.param(
                f"{self.cell}{layer}_wx",
                nn.initializers.glorot_uniform(),
                (d_in, gates * self.hidden),
                self.param_dtype,
            )
            w_h = self.param(
                f"{self.cell}{layer}_wh",
                nn.initializers.orthogonal(column_axis=-1),
                (self.hidden, gates * self.hidden),
                self.param_dtype,
            )
            layer_carry = carry[layer] if carry is not None else None
            if self.cell == "gru":
                b_x = self.param(
                    f"gru{layer}_bx", nn.initializers.zeros,
                    (gates * self.hidden,), self.param_dtype
                )
                b_h = self.param(
                    f"gru{layer}_bh", nn.initializers.zeros,
                    (gates * self.hidden,), self.param_dtype
                )
                h0 = (layer_carry if layer_carry is not None
                      else jnp.zeros((B, self.hidden))).astype(h.dtype)
                y, h_last = ops.gru_scan(
                    h, h0, w_x, w_h, b_x, b_h, reset_mask=reset,
                    use_pallas=self.use_pallas,
                )
                new_carry.append(h_last)
            else:
                b = self.param(
                    f"lstm{layer}_b", _lstm_bias_init,
                    (gates * self.hidden,), self.param_dtype
                )
                if layer_carry is not None:
                    h0, c0 = (s.astype(h.dtype) for s in layer_carry)
                else:
                    h0 = c0 = jnp.zeros((B, self.hidden), dtype=h.dtype)
                y, (h_last, c_last) = ops.lstm_scan(
                    h, h0, c0, w_x, w_h, b, reset_mask=reset,
                    use_pallas=self.use_pallas,
                )
                new_carry.append((h_last, c_last))
            h = y + h if (self.residual and d_in == self.hidden) else y
            if self.dropout_rate > 0.0 and layer < self.num_layers - 1:
                h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        if carry is not None:
            return h, tuple(new_carry)
        return h


# Historical name (pre cell-type support); param tree for cell="gru" is
# unchanged, so existing checkpoints load as-is.
GRUTower = RNNTower


class SASRecBlock(nn.Module):
    """One SASRec transformer block: pre-LN causal MHA + pointwise FFN."""

    hidden: int
    num_heads: int
    mlp_dim: int
    dropout_rate: float
    use_pallas: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        # `deterministic` is positional so nn.remat can mark it static.
        B, T, H = x.shape
        Dh = self.hidden // self.num_heads
        y = nn.LayerNorm(dtype=x.dtype, param_dtype=self.param_dtype)(x)
        qkv = nn.DenseGeneral(
            (3, self.num_heads, Dh),
            dtype=x.dtype,
            param_dtype=self.param_dtype,
            name="qkv",
        )(y)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, T, N, Dh]
        attn = ops.causal_attention(q, k, v, use_pallas=self.use_pallas)
        attn = attn.reshape(B, T, self.num_heads * Dh)
        attn = nn.Dense(
            self.hidden, dtype=x.dtype, param_dtype=self.param_dtype, name="proj"
        )(attn)
        attn = nn.Dropout(self.dropout_rate)(attn, deterministic=deterministic)
        x = x + attn

        y = nn.LayerNorm(dtype=x.dtype, param_dtype=self.param_dtype)(x)
        y = nn.Dense(self.mlp_dim, dtype=x.dtype, param_dtype=self.param_dtype)(y)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        y = nn.Dense(self.hidden, dtype=x.dtype, param_dtype=self.param_dtype)(y)
        y = nn.Dropout(self.dropout_rate)(y, deterministic=deterministic)
        return x + y


class SASRecTower(nn.Module):
    """SASRec encoder (Kang & McAuley, ICDM'18 lineage): learned positional
    embeddings + N causal self-attention blocks + final LayerNorm.

    Causality guarantees position t never sees items > t (leak test in
    tests/models). Padding sits at the tail, so causal masking alone keeps
    real positions clean of pad keys; pad positions' outputs are dropped by
    the loss mask.
    """

    hidden: int
    num_layers: int
    num_heads: int
    mlp_dim: int
    max_len: int
    dropout_rate: float = 0.1
    use_pallas: bool = True
    remat: bool = False
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array, *, deterministic: bool = True) -> jax.Array:
        B, T, H = x.shape
        pos_table = self.param(
            "pos_embedding",
            nn.initializers.normal(0.02),
            (self.max_len, self.hidden),
            self.param_dtype,
        )
        x = x * (self.hidden ** 0.5)
        x = x + pos_table[None, :T].astype(x.dtype)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        # Zero pad positions so they contribute nothing downstream.
        x = x * mask[:, :, None].astype(x.dtype)
        # Rematerialized blocks recompute activations in backward instead of
        # saving them — the long-context memory lever (SURVEY.md §5.7).
        block_cls = (
            nn.remat(SASRecBlock, static_argnums=(2,))
            if self.remat else SASRecBlock
        )
        for i in range(self.num_layers):
            # Explicit names keep the param tree identical with remat on or
            # off (nn.remat would otherwise rename the auto-scope and break
            # checkpoint compatibility across the toggle).
            x = block_cls(
                hidden=self.hidden,
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                dropout_rate=self.dropout_rate,
                use_pallas=self.use_pallas,
                param_dtype=self.param_dtype,
                name=f"block{i}",
            )(x, deterministic)
            x = x * mask[:, :, None].astype(x.dtype)
        return nn.LayerNorm(dtype=x.dtype, param_dtype=self.param_dtype)(x)
