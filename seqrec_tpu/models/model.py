"""SeqRecModel (L3): embedding table + sequence tower + scoring heads.

One flax module owns the item table so input/output tying is natural
(SURVEY.md §2 #8-#12). The heads are methods:

- ``encode``: ids -> per-step hidden states,
- ``loss``: masked full-softmax / sampled-softmax / BPR training loss,
- ``scores``: eval-time logits vs. the full catalog or a candidate set.

Batch layout (produced by seqrec_tpu.data): ``inputs`` [B, T] int32 item ids
(0 = pad), ``targets`` [B, T] next-item ids, ``mask`` [B, T] {0,1} — loss and
metrics only count positions with mask 1 (SURVEY.md §2 #13).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from seqrec_tpu import ops
from seqrec_tpu.config import MeshConfig, ModelConfig
from seqrec_tpu.models.towers import RNNTower, SASRecTower
from seqrec_tpu.ops import xla as xla_ops

PAD_ID = 0

# Losses that train against a shared sampled-negative set (vs. full_softmax's
# whole-catalog matmul). top1 and bpr_max are the GRU4Rec-lineage ranking
# losses (Hidasi et al. ICLR'16; Hidasi & Karatzoglou CIKM'18).
SAMPLED_LOSSES = ("sampled_softmax", "bpr", "top1", "bpr_max")


class SeqRecModel(nn.Module):
    vocab_size: int  # includes pad id 0
    # Table row count >= vocab_size; padded up so row-sharding over the model
    # axis divides evenly (parallel.embedding.padded_vocab). Rows >= vocab_size
    # are never valid ids; their logit columns are masked to -inf.
    table_size: Optional[int] = None
    # Personalization: user table with num_users+1 rows (0 = unknown), padded
    # like the item table; user vector is added to every input position.
    num_users: int = 0
    use_user_embedding: bool = False
    user_table_size: Optional[int] = None
    arch: str = "gru4rec"
    embed_dim: int = 64
    hidden: int = 64
    num_layers: int = 1
    cell_type: str = "gru"
    residual: bool = False
    num_heads: int = 1
    mlp_dim: int = 256
    max_len: int = 200
    dropout_rate: float = 0.1
    loss_type: str = "full_softmax"
    # Training negative-sampler kind ("uniform" | "log_uniform"): the
    # sampled-softmax logQ correction for POSITIVES must match the
    # distribution the negatives came from (data/negative.pos_log_prob).
    neg_sampler: str = "log_uniform"
    tie_embeddings: bool = True
    output_bias: bool = True
    use_pallas: bool = True
    remat: bool = False
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16
    # Sharded-embedding engine (L2). When `mesh` is set and shard_embeddings
    # is True, the table is row-sharded over the 'model' axis and lookups go
    # through the collective exchange in seqrec_tpu.parallel.
    mesh: Optional[Mesh] = None
    shard_embeddings: bool = False
    dedup_lookup: bool = True

    def setup(self):
        rows = self.table_size if self.table_size is not None else self.vocab_size
        if rows < self.vocab_size:
            raise ValueError("table_size must be >= vocab_size")
        self._rows = rows
        self.item_embedding = self.param(
            "item_embedding",
            nn.initializers.normal(1.0 / (self.embed_dim ** 0.5)),
            (rows, self.embed_dim),
            self.param_dtype,
        )
        if self.tie_embeddings:
            if self.hidden != self.embed_dim:
                raise ValueError("tie_embeddings requires hidden == embed_dim")
        else:
            self.output_embedding = self.param(
                "output_embedding",
                nn.initializers.normal(1.0 / (self.hidden ** 0.5)),
                (rows, self.hidden),
                self.param_dtype,
            )
        if self.output_bias:
            self.out_bias = self.param(
                "output_bias", nn.initializers.zeros, (rows,), self.param_dtype
            )
        if self.use_user_embedding:
            u_rows = (
                self.user_table_size
                if self.user_table_size is not None
                else self.num_users + 1
            )
            self.user_embedding = self.param(
                "user_embedding",
                nn.initializers.normal(1.0 / (self.embed_dim ** 0.5)),
                (u_rows, self.embed_dim),
                self.param_dtype,
            )
        if self.arch == "gru4rec":
            self.tower = RNNTower(
                hidden=self.hidden,
                num_layers=self.num_layers,
                dropout_rate=self.dropout_rate,
                cell=self.cell_type,
                residual=self.residual,
                use_pallas=self.use_pallas,
                param_dtype=self.param_dtype,
            )
        elif self.arch == "sasrec":
            self.tower = SASRecTower(
                hidden=self.hidden,
                num_layers=self.num_layers,
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                max_len=self.max_len,
                dropout_rate=self.dropout_rate,
                use_pallas=self.use_pallas,
                remat=self.remat,
                param_dtype=self.param_dtype,
            )
        else:
            raise ValueError(f"unknown arch {self.arch!r}")
        self.input_dropout = nn.Dropout(self.dropout_rate)

    # ---- helpers -------------------------------------------------------

    def _out_table(self) -> jax.Array:
        return self.item_embedding if self.tie_embeddings else self.output_embedding

    def _bias(self) -> Optional[jax.Array]:
        return self.out_bias if self.output_bias else None

    def _lookup(self, table: jax.Array, ids: jax.Array) -> jax.Array:
        if self.shard_embeddings and self.mesh is not None:
            from seqrec_tpu.parallel.embedding import sharded_gather

            out = sharded_gather(table, ids, self.mesh, dedup=self.dedup_lookup)
        else:
            out = ops.embedding_gather(table, ids, use_pallas=self.use_pallas)
        return out.astype(self.compute_dtype)

    # ---- public methods -------------------------------------------------

    def __call__(self, inputs: jax.Array, mask: jax.Array, *, users=None,
                 deterministic: bool = True):
        return self.encode(inputs, mask, users=users,
                           deterministic=deterministic)

    def _input_embed(self, inputs: jax.Array, table_override) -> jax.Array:
        """Input-side embedding lookup, shared by encode and loss_stream.

        With `table_override` ([K, D] REPLICATED sub-table rows, `inputs`
        already remapped to sub-table positions — the sparse-embedding
        trainer's contract) this is a plain gather, never the sharded
        collective (which expects original ids against the row-sharded full
        table); autodiff then produces a [K, D] cotangent instead of a
        dense [V, D] one."""
        if table_override is None:
            return self._lookup(self.item_embedding, inputs)
        return ops.embedding_gather(
            table_override, inputs, use_pallas=self.use_pallas
        ).astype(self.compute_dtype)

    def encode(self, inputs: jax.Array, mask: jax.Array, *, users=None,
               deterministic: bool = True, table_override=None):
        """`table_override`: see _input_embed."""
        with jax.named_scope("embedding_lookup"):
            x = self._input_embed(inputs, table_override)
            if self.use_user_embedding and users is not None:
                u = self._lookup(self.user_embedding, users)  # [B, D]
                x = x + u[:, None, :]
        if self.arch == "gru4rec" and self.dropout_rate > 0.0:
            x = self.input_dropout(x, deterministic=deterministic)
        with jax.named_scope("tower"):
            return self.tower(x, mask, deterministic=deterministic)

    def loss(
        self,
        batch: Dict[str, jax.Array],
        *,
        neg_ids: Optional[jax.Array] = None,  # [S] shared sampled negatives
        neg_log_q: Optional[jax.Array] = None,  # [S]
        pos_log_q: Optional[jax.Array] = None,  # [B*T]; see _head_loss
        deterministic: bool = False,
        table_override=None,  # [K, D] input sub-table; see encode
        out_table_override=None,  # [K2, H] output sub-table (untied sparse)
    ):
        """Masked training loss. Returns (sum_loss, sum_weight)."""
        inputs, targets, mask = batch["inputs"], batch["targets"], batch["mask"]
        h = self.encode(inputs, mask, users=batch.get("users"),
                        deterministic=deterministic,
                        table_override=table_override)
        return self._head_loss(h, targets, mask, neg_ids, neg_log_q,
                               pos_log_q=pos_log_q,
                               table_override=table_override,
                               out_table_override=out_table_override)

    def loss_stream(
        self,
        batch: Dict[str, jax.Array],
        carry,
        *,
        neg_ids: Optional[jax.Array] = None,
        neg_log_q: Optional[jax.Array] = None,
        pos_log_q: Optional[jax.Array] = None,
        deterministic: bool = False,
        table_override=None,  # [K, D] input sub-table; see encode
        out_table_override=None,  # [K2, H] output sub-table (untied sparse)
    ):
        """Session-parallel TBPTT window (original GRU4Rec training regime):
        batch is a dense packed stream {inputs, targets, mask, reset}
        (data.batching.make_session_stream); `carry` is the RNN state from
        the previous window (towers.zero_carry to start). Returns
        (sum_loss, sum_weight, new_carry); the trainer stop-gradients
        new_carry at the window boundary. The sub-table overrides compose
        the sparse-embedding trainer with session streaming (ids already
        remapped, pos_log_q precomputed from original ids — same contract
        as loss())."""
        if self.arch != "gru4rec":
            raise ValueError("session-parallel streaming needs an RNN tower")
        if self.use_user_embedding:
            raise ValueError("session streams are anonymous; disable "
                             "use_user_embedding")
        inputs, targets, mask = batch["inputs"], batch["targets"], batch["mask"]
        with jax.named_scope("embedding_lookup"):
            x = self._input_embed(inputs, table_override)
        if self.dropout_rate > 0.0:
            x = self.input_dropout(x, deterministic=deterministic)
        with jax.named_scope("tower"):
            h, new_carry = self.tower(
                x, mask, carry=carry, reset=batch["reset"],
                deterministic=deterministic,
            )
        loss_sum, w_sum = self._head_loss(
            h, targets, mask, neg_ids, neg_log_q, pos_log_q=pos_log_q,
            table_override=table_override,
            out_table_override=out_table_override,
        )
        return loss_sum, w_sum, new_carry

    def _head_loss(self, h, targets, mask, neg_ids, neg_log_q,
                   pos_log_q=None, table_override=None,
                   out_table_override=None):
        """`pos_log_q` override exists for the sparse-embedding trainer path,
        which remaps ids to sub-table positions before apply — the logQ
        correction must be computed from the ORIGINAL ids, so the trainer
        passes it in precomputed (train/sparse_embed.py). `table_override`
        likewise substitutes the input sub-table (reused for the output side
        when embeddings are tied); `out_table_override` substitutes an
        independently-remapped output sub-table in the untied case (targets
        and neg_ids are then positions into IT, not into table_override)."""
        B, T, H = h.shape
        h2 = h.reshape(B * T, H)
        t2 = targets.reshape(B * T)
        w2 = mask.reshape(B * T).astype(jnp.float32)

        if out_table_override is not None:
            out_table = out_table_override
        elif table_override is not None:
            if not self.tie_embeddings:
                raise ValueError(
                    "untied output table needs out_table_override"
                )
            out_table = table_override
        else:
            out_table = self._out_table()
        if self.loss_type == "full_softmax":
            return xla_ops.full_softmax_loss(
                h2, out_table.astype(self.compute_dtype), t2, w2, bias=self._bias(),
                num_valid=self.vocab_size if self._rows > self.vocab_size else None,
            )
        if self.loss_type in SAMPLED_LOSSES:
            if neg_ids is None:
                raise ValueError(f"{self.loss_type} needs neg_ids")
            if table_override is not None or out_table_override is not None:
                # Sub-table positions index a replicated [K, H] table: plain
                # gather (see encode).
                pos_emb = ops.embedding_gather(
                    out_table, t2, use_pallas=self.use_pallas
                ).astype(self.compute_dtype)
            else:
                pos_emb = self._lookup(out_table, t2)
            neg_emb = ops.embedding_gather(
                out_table, neg_ids, use_pallas=self.use_pallas
            ).astype(self.compute_dtype)
            if self.loss_type == "sampled_softmax":
                if pos_log_q is None and neg_log_q is not None:
                    from seqrec_tpu.data.negative import pos_log_prob

                    pos_log_q = pos_log_prob(t2, self.vocab_size,
                                             self.neg_sampler)
                return ops.sampled_softmax_loss(
                    h2, pos_emb, neg_emb, t2, neg_ids, w2,
                    pos_log_q=pos_log_q, neg_log_q=neg_log_q,
                    use_pallas=self.use_pallas,
                )
            fn = {
                "bpr": xla_ops.bpr_loss,
                "top1": xla_ops.top1_loss,
                "bpr_max": xla_ops.bpr_max_loss,
            }[self.loss_type]
            return fn(h2, pos_emb, neg_emb, t2, neg_ids, w2)
        raise ValueError(f"unknown loss {self.loss_type!r}")

    def last_hidden(self, inputs: jax.Array, mask: jax.Array,
                    users=None) -> jax.Array:
        """[B, H] hidden state at the LAST real position of each row (the
        next-item query vector; used by the sharded full-catalog eval)."""
        h = self.encode(inputs, mask, users=users, deterministic=True)
        last = jnp.maximum(jnp.sum(mask.astype(jnp.int32), axis=1) - 1, 0)
        return jnp.take_along_axis(h, last[:, None, None], axis=1)[:, 0]

    def output_table(self) -> jax.Array:
        return self._out_table()

    def output_bias_value(self) -> Optional[jax.Array]:
        return self._bias()

    def scores(
        self,
        inputs: jax.Array,
        mask: jax.Array,
        *,
        users: Optional[jax.Array] = None,  # [B] user ids
        candidates: Optional[jax.Array] = None,  # [B, C] per-row candidate ids
    ) -> jax.Array:
        """Eval-time scores from the LAST real position of each row.

        Returns [B, V] (candidates=None) or [B, C]. Pad rows (mask all-zero)
        produce garbage scores; eval masks them out.
        """
        h_last = self.last_hidden(inputs, mask, users=users)  # [B, H]
        out_table = self._out_table()
        bias = self._bias()
        if candidates is None:
            logits = xla_ops.full_logits(
                h_last, out_table.astype(self.compute_dtype), bias
            ).astype(jnp.float32)
            if self._rows > self.vocab_size:
                cols = jnp.arange(self._rows)
                logits = jnp.where(cols[None, :] < self.vocab_size, logits, -1e30)
            return logits
        cand_emb = ops.embedding_gather(
            out_table, candidates, use_pallas=self.use_pallas
        ).astype(self.compute_dtype)  # [B, C, H]
        logits = jnp.einsum("bh,bch->bc", h_last, cand_emb).astype(jnp.float32)
        if bias is not None:
            logits = logits + jnp.take(bias, candidates, axis=0).astype(jnp.float32)
        return logits


def build_model(
    cfg: ModelConfig,
    vocab_size: int,
    mesh: Optional[Mesh] = None,
    mesh_cfg: Optional[MeshConfig] = None,
    num_users: int = 0,
    neg_sampler: str = "log_uniform",
) -> SeqRecModel:
    mesh_cfg = mesh_cfg or MeshConfig()
    shard = bool(mesh_cfg.shard_embeddings and mesh is not None)
    table_size = vocab_size
    user_table_size = num_users + 1
    if shard:
        from seqrec_tpu.parallel.embedding import padded_vocab
        from seqrec_tpu.runtime.mesh import MODEL_AXIS

        table_size = padded_vocab(vocab_size, mesh.shape[MODEL_AXIS])
        user_table_size = padded_vocab(num_users + 1, mesh.shape[MODEL_AXIS])
    return SeqRecModel(
        vocab_size=vocab_size,
        table_size=table_size,
        num_users=num_users,
        use_user_embedding=cfg.use_user_embedding,
        user_table_size=user_table_size,
        arch=cfg.arch,
        embed_dim=cfg.embed_dim,
        hidden=cfg.hidden,
        num_layers=cfg.num_layers,
        cell_type=cfg.cell_type,
        residual=cfg.residual,
        num_heads=cfg.num_heads,
        mlp_dim=cfg.mlp_dim if cfg.mlp_dim is not None else 4 * cfg.embed_dim,
        max_len=cfg.max_len,
        dropout_rate=cfg.dropout_rate,
        loss_type=cfg.loss,
        neg_sampler=neg_sampler,
        tie_embeddings=cfg.tie_embeddings,
        output_bias=cfg.loss == "full_softmax",
        use_pallas=cfg.use_pallas,
        remat=cfg.remat,
        param_dtype=jnp.dtype(cfg.param_dtype),
        compute_dtype=jnp.dtype(cfg.compute_dtype),
        mesh=mesh,
        shard_embeddings=shard,
        dedup_lookup=mesh_cfg.dedup_lookup,
    )
