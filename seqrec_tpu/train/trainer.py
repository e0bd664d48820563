"""Training engine (L5): jit/pjit train loop over bucketed batches.

Contrast with the reference's Session loop (SURVEY.md §3.1): the whole step —
embedding lookup (possibly a collective exchange), tower, head, backward,
optimizer — is ONE compiled XLA program per bucket shape; Python is only the
feeder. Grad reduction over the 'data' axis and embedding-shard collectives
are emitted by XLA from the shardings, never written by hand here.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from seqrec_tpu.config import RunConfig
from seqrec_tpu.data.batching import make_train_batches
from seqrec_tpu.data.prefetch import DevicePrefetcher
from seqrec_tpu.data.dataset import SequenceDataset, load_dataset
from seqrec_tpu.data.negative import sample_negatives
from seqrec_tpu.eval.harness import evaluate
from seqrec_tpu.models import build_model
from seqrec_tpu.models.model import SAMPLED_LOSSES
from seqrec_tpu.runtime import enable_compilation_cache, make_mesh
from seqrec_tpu.runtime.mesh import DATA_AXIS, MODEL_AXIS
from seqrec_tpu.train.checkpoint import CheckpointManager, abstract_like
from seqrec_tpu.train.state import TrainState, make_optimizer, make_schedule
from seqrec_tpu.utils.logging import Heartbeat, MetricsLogger


def _crossed(every: int, lo: int, hi: int) -> bool:
    """True when any step s in [lo, hi) satisfies (s + 1) % every == 0 —
    the multi-step generalization of fit()'s cadence checks (at hi == lo + 1
    it reduces exactly to the old (step + 1) % every == 0)."""
    return every > 0 and (hi // every) > (lo // every)


class DeclinedDict(dict):
    """A batch dict `pack` already declined (non-canonical): put_batch must
    not re-run the canonical-shape array checks on it (ADVICE r3 — the
    checks would otherwise run twice per declined batch on the feeder
    thread)."""


def _group_wires(it, pack, k: int, limit: int):
    """Group up to `k` consecutive same-bucket canonical batches from `it`
    into one stacked [k, B, T+2] wire array (train.steps_per_call). Yields
    (bucket, payload) with payload one of: a stacked np group, a single
    [B, T+2] np wire, or the original dict (tagged DeclinedDict) when `pack`
    declines the batch (non-canonical). Order is preserved exactly; at most
    `limit` batches are ever emitted inside full groups so fit() never
    overshoots num_steps."""
    buf = []  # staged (bucket, wire) with identical bucket + shape
    emitted = 0
    for bucket, batch in it:
        wire = pack(batch)
        if buf and (
            wire is None
            or bucket != buf[0][0]
            or wire.shape != buf[0][1].shape
        ):
            for b, w in buf:
                yield b, w
            emitted += len(buf)
            buf = []
        if wire is None:
            yield bucket, DeclinedDict(batch)
            emitted += 1
            continue
        buf.append((bucket, wire))
        if len(buf) == k:
            if emitted + k <= limit:
                yield bucket, np.stack([w for _, w in buf])
            else:  # tail: not enough steps left for a full group
                for b, w in buf:
                    yield b, w
            emitted += k
            buf = []
    for b, w in buf:
        yield b, w


class Trainer:
    def __init__(self, cfg: RunConfig, ds: Optional[SequenceDataset] = None,
                 mesh: Optional[Mesh] = None):
        self.cfg = cfg
        # Before any jit: capture every executable this run compiles so the
        # next process (driver rerun, eval-from-checkpoint, CI) pays
        # deserialization, not recompilation (runtime/compile_cache.py).
        enable_compilation_cache(cfg.train.compilation_cache_dir)
        self.ds = ds if ds is not None else load_dataset(cfg.data)
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh.model_axis)
        self.model = build_model(
            cfg.model, self.ds.vocab_size, mesh=self.mesh, mesh_cfg=cfg.mesh,
            num_users=self.ds.num_users, neg_sampler=cfg.data.neg_sampler,
        )
        self._sparse_embed = bool(cfg.train.sparse_embedding_update)
        if self._sparse_embed:
            from seqrec_tpu.train import sparse_embed

            sparse_embed.validate_config(cfg)
        # Sparse mode clips the global norm manually (tower + sub-table
        # grads together); the optax chain must not clip a second time.
        self.optimizer = make_optimizer(cfg.train,
                                        with_clip=not self._sparse_embed)
        self.schedule = make_schedule(cfg.train)
        self.num_devices = self.mesh.size
        local_mesh_devices = sum(
            1 for d in self.mesh.devices.flat
            if d.process_index == jax.process_index()
        )
        self.local_batch = cfg.data.batch_size * local_mesh_devices
        self.global_batch = cfg.data.batch_size * self.num_devices

        # ---- shardings ---------------------------------------------------
        self._repl = NamedSharding(self.mesh, P())
        self._batch_sharding = NamedSharding(self.mesh, P((DATA_AXIS, MODEL_AXIS)))
        self._needs_vocab_shard = bool(
            cfg.mesh.shard_embeddings and self.mesh.shape[MODEL_AXIS] > 1
        )

        self._train_step = jax.jit(
            self._train_step_impl,
            donate_argnums=(0,),
        )
        # Grouped wire batches [K, B, T+2]: batch rows live on axis 1.
        self._multi_batch_sharding = NamedSharding(
            self.mesh, P(None, (DATA_AXIS, MODEL_AXIS))
        )
        self._train_step_multi = jax.jit(
            self._train_step_multi_impl,
            donate_argnums=(0,),
        )

    # ---- sharding helpers ----------------------------------------------

    def _leaf_sharding(self, leaf) -> NamedSharding:
        """Row-shard any vocab-leading leaf (embedding tables + their
        optimizer moments + output bias) over the model axis; replicate the
        rest (towers are small, SURVEY.md §2.2)."""
        shape = getattr(leaf, "shape", ())
        shardable_rows = {self.model.table_size}
        if self.model.use_user_embedding:
            shardable_rows.add(self.model.user_table_size)
        if (
            self._needs_vocab_shard
            and len(shape) >= 1
            and shape[0] in shardable_rows
        ):
            return NamedSharding(
                self.mesh, P(MODEL_AXIS, *([None] * (len(shape) - 1)))
            )
        return self._repl

    def state_sharding(self, abstract_state: TrainState):
        sh = jax.tree.map(self._leaf_sharding, abstract_state)
        if abstract_state.carry is not None:
            # RNN carry rows align with batch rows: shard over the flattened
            # mesh like every batch plane.
            sh = sh.replace(
                carry=jax.tree.map(
                    lambda _: self._batch_sharding, abstract_state.carry
                )
            )
        return sh

    # ---- state init -----------------------------------------------------

    def init_state(self, seed: Optional[int] = None) -> TrainState:
        seed = self.cfg.train.seed if seed is None else seed
        # Cache the compiled init per seed: benchmarks reseed fresh states
        # repeatedly (donated args), and a fresh jax.jit wrapper per call
        # would recompile the multi-second init program every time.
        cache = getattr(self, "_init_cache", None)
        if cache is None:
            cache = self._init_cache = {}
        if seed in cache:
            return cache[seed](jax.random.key(seed))
        T = self.cfg.data.buckets[0] if self.cfg.data.buckets else self.cfg.data.max_len

        # Dummy batch leading dim must divide the mesh (sharded lookup uses
        # shard_map over ('data','model')).
        dummy_b = self.num_devices

        def _init(rng) -> TrainState:
            dummy_ids = jnp.zeros((dummy_b, T), jnp.int32)
            dummy_mask = jnp.ones((dummy_b, T), jnp.float32)
            params = self.model.init(rng, dummy_ids, dummy_mask)
            embed_opt = None
            if self._sparse_embed:
                from seqrec_tpu.train import sparse_embed

                # The big tables never enter optax: their optimizer state is
                # row-wise (embed_opt) and their grads are never dense.
                names = self._sparse_table_names()
                rest = {k: v for k, v in params["params"].items()
                        if k not in names}
                opt_state = self.optimizer.init(rest)
                embed_opt = {
                    n: sparse_embed.init_row_opt(
                        self.cfg.train.optimizer, params["params"][n]
                    )
                    for n in names
                }
            else:
                opt_state = self.optimizer.init(params["params"])
            carry = None
            if self.cfg.data.session_parallel:
                from seqrec_tpu.models.towers import zero_carry

                carry = zero_carry(
                    self.cfg.model.cell_type, self.cfg.model.num_layers,
                    self.global_batch, self.cfg.model.hidden,
                    jnp.dtype(self.cfg.model.compute_dtype),
                )
            return TrainState(
                step=jnp.zeros((), jnp.int32),
                params=params,
                opt_state=opt_state,
                rng=jax.random.key(seed + 1),
                carry=carry,
                embed_opt=embed_opt,
            )

        abstract = jax.eval_shape(_init, jax.random.key(seed))
        shardings = self.state_sharding(abstract)
        cache[seed] = jax.jit(_init, out_shardings=shardings)
        return cache[seed](jax.random.key(seed))

    # ---- the compiled step ----------------------------------------------

    def _train_step_impl(self, state: TrainState, batch) -> Tuple[TrainState, Dict[str, jax.Array]]:
        cfg = self.cfg
        if not isinstance(batch, dict):  # compact wire format (put_batch)
            batch = (
                self._unpack_session_wire(batch)
                if cfg.data.session_parallel
                else self._unpack_wire(batch)
            )
        step_rng = jax.random.fold_in(state.rng, state.step)
        neg_rng, dropout_rng = jax.random.split(step_rng)

        neg_ids = neg_log_q = None
        if cfg.model.loss in SAMPLED_LOSSES:
            neg_ids, neg_log_q = sample_negatives(
                neg_rng, cfg.model.num_negatives, self.ds.vocab_size,
                cfg.data.neg_sampler,
            )
            if cfg.model.loss != "sampled_softmax":
                neg_log_q = None  # logQ correction is softmax-specific

        if self._sparse_embed:
            return self._sparse_step(state, batch, neg_ids, neg_log_q,
                                     dropout_rng)

        if cfg.data.session_parallel:

            def loss_fn(params):
                loss_sum, w_sum, new_carry = self.model.apply(
                    params,
                    batch,
                    state.carry,
                    neg_ids=neg_ids,
                    neg_log_q=neg_log_q,
                    deterministic=False,
                    method=self.model.loss_stream,
                    rngs={"dropout": dropout_rng},
                )
                # TBPTT: gradients do not flow across window boundaries.
                new_carry = jax.lax.stop_gradient(new_carry)
                return loss_sum / jnp.maximum(w_sum, 1.0), (
                    loss_sum, w_sum, new_carry
                )

        else:

            def loss_fn(params):
                loss_sum, w_sum = self.model.apply(
                    params,
                    batch,
                    neg_ids=neg_ids,
                    neg_log_q=neg_log_q,
                    deterministic=False,
                    method=self.model.loss,
                    rngs={"dropout": dropout_rng},
                )
                return loss_sum / jnp.maximum(w_sum, 1.0), (
                    loss_sum, w_sum, None
                )

        (loss, (loss_sum, w_sum, new_carry)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        gnorm = optax.global_norm(grads["params"])
        # A single NaN/inf anywhere in the gradient poisons the global norm,
        # so one scalar check covers the whole tree (SURVEY.md §5.2: detect,
        # don't launder — fit() halts on this flag under train.debug_nans).
        nonfinite = jnp.logical_or(
            ~jnp.isfinite(gnorm), ~jnp.isfinite(loss)
        )
        if cfg.train.sanitize_nans:
            grads = jax.tree.map(
                lambda g: jax.lax.select(
                    jnp.isfinite(g).all(), g, jnp.nan_to_num(g)
                ),
                grads,
            )
        updates, new_opt = self.optimizer.update(
            grads["params"], state.opt_state, state.params["params"]
        )
        new_params = {"params": optax.apply_updates(state.params["params"], updates)}
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            rng=state.rng,
            carry=new_carry,
        )
        metrics = {
            "loss": loss,
            "tokens": w_sum,
            "grad_norm": gnorm,
            "nonfinite": nonfinite,
        }
        return new_state, metrics

    def _train_step_multi_impl(
        self, state: TrainState, wires: jax.Array
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        """K train steps in ONE executable: lax.scan of the single-step body
        over a [K, B, T+2] group of wire batches (train.steps_per_call).
        Bitwise-identical math to K separate calls — the per-step RNG folds
        on state.step exactly as in _train_step_impl — but one host dispatch
        and one H2D transfer amortize the relay overhead that separates the
        e2e number from the compute-only one (BASELINE.md)."""

        def body(s, wire):
            s2, m = self._train_step_impl(s, wire)
            return s2, m

        state, ms = jax.lax.scan(body, state, wires)
        metrics = {
            "loss": ms["loss"].mean(),
            "tokens": ms["tokens"].sum(),
            # Max over the group, not the last step's value: a gradient
            # spike anywhere inside the group must be visible in the log
            # line that summarizes it (ADVICE r3).
            "grad_norm": ms["grad_norm"].max(),
            "nonfinite": ms["nonfinite"].any(),
        }
        return state, metrics

    def _sparse_table_names(self):
        names = ["item_embedding"]
        if not self.cfg.model.tie_embeddings:
            names.append("output_embedding")
        return names

    def _sparse_step(self, state: TrainState, batch, neg_ids, neg_log_q,
                     dropout_rng) -> Tuple[TrainState, Dict[str, jax.Array]]:
        """Large-catalog step: no dense [V, D] gradient ever exists. See
        train/sparse_embed.py for the scheme and its optimizer semantics.

        Tied embeddings: ONE unique set covers inputs + targets + negatives.
        Untied: the input table's set covers inputs; the output table gets
        its own set (targets + negatives) and its own sub-table override."""
        from seqrec_tpu.data.negative import pos_log_prob
        from seqrec_tpu.train import sparse_embed

        cfg = self.cfg
        tied = cfg.model.tie_embeddings
        params = state.params["params"]
        names = self._sparse_table_names()
        tables = {n: params[n] for n in names}
        rest = {k: v for k, v in params.items() if k not in names}

        inputs, targets = batch["inputs"], batch["targets"]
        out_ids = jnp.concatenate([targets.reshape(-1), neg_ids])
        in_ids = (jnp.concatenate([inputs.reshape(-1), out_ids])
                  if tied else inputs.reshape(-1))
        rows = tables["item_embedding"].shape[0]

        # Row-sharded composition (sparse_embed module docstring): fetch the
        # replicated [K, D] sub-table with a shard_map psum-gather; single
        # chip / unsharded keeps the plain take. Either way the sub-table is
        # the differentiated leaf — no dense [V, D] cotangent exists.
        if self._needs_vocab_shard:
            fetch = lambda t, u: sparse_embed.sharded_sub_table(t, u, self.mesh)  # noqa: E731
        else:
            fetch = lambda t, u: t[u]  # noqa: E731

        # Capped budget (train.sparse_unique_budget): overflow ids embed as
        # an appended zeros sentinel row (position K) and contribute no
        # update — see remap_capped. cap == 0 keeps the exact worst-case
        # budget and the sentinel machinery entirely out of the graph.
        cap = int(cfg.train.sparse_unique_budget or 0)
        remap_fn = sparse_embed.remap_capped if cap else sparse_embed.remap

        def budget(n: int) -> int:
            b = sparse_embed.unique_budget(n, rows)
            return min(b, cap) if cap else b

        def with_sentinel(sub: jax.Array) -> jax.Array:
            if not cap:
                return sub
            return jnp.concatenate(
                [sub, jnp.zeros((1, sub.shape[1]), sub.dtype)]
            )

        uids_in = sparse_embed.collect_unique(in_ids,
                                              budget(in_ids.shape[0]))
        subs = {"in": with_sentinel(fetch(tables["item_embedding"], uids_in))}
        if tied:
            uids_out = uids_in
        else:
            uids_out = sparse_embed.collect_unique(out_ids,
                                                   budget(out_ids.shape[0]))
            subs["out"] = with_sentinel(
                fetch(tables["output_embedding"], uids_out)
            )

        batch_r = dict(batch)
        batch_r["inputs"] = remap_fn(uids_in, inputs)
        batch_r["targets"] = remap_fn(uids_out, targets)
        neg_ids_r = remap_fn(uids_out, neg_ids)
        pos_log_q = None
        if cfg.model.loss == "sampled_softmax" and neg_log_q is not None:
            # logQ must come from ORIGINAL ids (batch_r carries positions)
            # and from the SAME distribution the negatives were drawn from.
            pos_log_q = pos_log_prob(
                targets.reshape(-1), self.ds.vocab_size, cfg.data.neg_sampler
            )

        if cfg.data.session_parallel:

            def loss_fn(diff):
                subs_p, rest_p = diff
                loss_sum, w_sum, new_carry = self.model.apply(
                    {"params": {**rest_p, **tables}},
                    batch_r,
                    state.carry,
                    neg_ids=neg_ids_r,
                    neg_log_q=neg_log_q,
                    pos_log_q=pos_log_q,
                    deterministic=False,
                    table_override=subs_p["in"],
                    out_table_override=None if tied else subs_p["out"],
                    method=self.model.loss_stream,
                    rngs={"dropout": dropout_rng},
                )
                # TBPTT: no gradient across window boundaries (and the carry
                # must not pull the sub-table into the next step's cotangent).
                new_carry = jax.lax.stop_gradient(new_carry)
                return loss_sum / jnp.maximum(w_sum, 1.0), (
                    loss_sum, w_sum, new_carry
                )

        else:

            def loss_fn(diff):
                subs_p, rest_p = diff
                loss_sum, w_sum = self.model.apply(
                    {"params": {**rest_p, **tables}},
                    batch_r,
                    neg_ids=neg_ids_r,
                    neg_log_q=neg_log_q,
                    pos_log_q=pos_log_q,
                    deterministic=False,
                    table_override=subs_p["in"],
                    out_table_override=None if tied else subs_p["out"],
                    method=self.model.loss,
                    rngs={"dropout": dropout_rng},
                )
                return loss_sum / jnp.maximum(w_sum, 1.0), (
                    loss_sum, w_sum, None
                )

        (loss, (loss_sum, w_sum, new_carry)), (g_subs, g_rest) = (
            jax.value_and_grad(loss_fn, has_aux=True)((subs, rest))
        )

        gnorm = optax.global_norm((g_subs, g_rest))
        nonfinite = jnp.logical_or(~jnp.isfinite(gnorm), ~jnp.isfinite(loss))
        clip = cfg.train.grad_clip_norm
        if clip and clip > 0:
            scale = jnp.minimum(1.0, clip / jnp.maximum(gnorm, 1e-12))
            g_subs = jax.tree.map(lambda g: g * scale, g_subs)
            g_rest = jax.tree.map(lambda g: g * scale, g_rest)
        if cfg.train.sanitize_nans:
            g_subs, g_rest = jax.tree.map(
                lambda g: jax.lax.select(
                    jnp.isfinite(g).all(), g, jnp.nan_to_num(g)
                ),
                (g_subs, g_rest),
            )

        updates, new_opt = self.optimizer.update(g_rest, state.opt_state, rest)
        new_rest = optax.apply_updates(rest, updates)
        lr = self.schedule(state.step)
        new_tables = {}
        new_embed_opt = {}
        per_table = [("item_embedding", uids_in, g_subs["in"])]
        if not tied:
            per_table.append(("output_embedding", uids_out, g_subs["out"]))
        for name, uids, g in per_table:
            if cap:
                g = g[:-1]  # zeros-sentinel row: overflow updates dropped
            if self._needs_vocab_shard:
                new_tables[name], new_embed_opt[name] = (
                    sparse_embed.sharded_row_update(
                        cfg.train.optimizer, lr, tables[name],
                        state.embed_opt[name], uids, g, state.step, self.mesh,
                    )
                )
            else:
                new_tables[name], new_embed_opt[name] = sparse_embed.row_update(
                    cfg.train.optimizer, lr, tables[name],
                    state.embed_opt[name], uids, g, state.step,
                )

        new_state = TrainState(
            step=state.step + 1,
            params={"params": {**new_rest, **new_tables}},
            opt_state=new_opt,
            rng=state.rng,
            carry=new_carry,
            embed_opt=new_embed_opt,
        )
        metrics = {
            "loss": loss,
            "tokens": w_sum,
            "grad_norm": gnorm,
            "nonfinite": nonfinite,
        }
        return new_state, metrics

    # ---- host-side batch placement --------------------------------------
    #
    # Host→device bandwidth is the measured pipeline bottleneck on this
    # relay (~50 MB/s effective: 300 KB/batch ≈ 6–7 ms while the compiled
    # step takes ~1.3 ms). The wire format is therefore COMPACT: a bucketed
    # train batch's {inputs, targets, mask, users} is fully determined by
    # the underlying item sequence (targets = inputs shifted by one, mask =
    # non-pad targets), so one [B, T+2] token array — int16 when the vocab
    # fits — carries everything and the compiled step reconstructs the
    # planes on device (VERDICT r2 missing #2: the gap, and this fix).

    @property
    def _wire_dtype(self):
        if (self.ds.vocab_size < 2 ** 15
                and (self.ds.num_users + 1) < 2 ** 15):
            return np.int16
        return np.int32

    @property
    def _session_wire_cols(self):
        """(T, E, W) column layout of the session wire format: T input
        tokens, E boundary-target slots, W bitmask words (8 reset bits per
        word). E = T//2 + 1 covers every window whose sessions average >= 2
        transitions; denser windows (many 1-pair sessions) fall back to the
        dict path via pack_session_batch returning None."""
        T = self.cfg.data.max_len
        return T, T // 2 + 1, (T + 7) // 8

    def pack_train_batch(self, batch: Dict[str, np.ndarray]) -> Optional[np.ndarray]:
        """Pack a CANONICAL bucketed train batch into the compact wire
        format: tokens[:, :T] = inputs, tokens[r, L_r] = last target (the
        one token inputs doesn't contain), tokens[:, T+1] = users. Returns
        None when the batch isn't canonical (session windows carry `reset`;
        tests may poison `mask`; custom weighted masks) — those ship as a
        plain dict."""
        if "targets" not in batch or "reset" in batch:
            return None
        inputs, targets, mask = batch["inputs"], batch["targets"], batch["mask"]
        B, T = inputs.shape
        tgt_nz = targets != 0
        if mask.shape != targets.shape or not (mask == tgt_nz).all():
            return None  # non-canonical (or NaN-poisoned) mask
        m = mask[:, 1:] > 0
        if not (inputs[:, 1:][m] == targets[:, :-1][m]).all():
            return None  # not a shifted next-item batch
        lens = tgt_nz.sum(1)
        tokens = np.zeros((B, T + 2), self._wire_dtype)
        tokens[:, :T] = inputs
        rows = np.flatnonzero(lens > 0)
        tokens[rows, lens[rows]] = targets[rows, lens[rows] - 1]
        tokens[:, T + 1] = batch.get("users", np.zeros((B,), np.int32))
        return tokens

    def pack_session_batch(self, batch: Dict[str, np.ndarray]) -> Optional[np.ndarray]:
        """Pack a session-parallel window into the compact session wire
        format (VERDICT r3 missing #2: the shipped rsc15 config shipped
        ~200 KB of dict planes per 0.7 ms step through a ~50 MB/s relay).

        A packed window's {inputs, targets, mask, reset} is almost fully
        determined by `inputs` + `reset`: mask is all ones (zero padding
        waste is the format's point), and targets[t] == inputs[t+1] except
        at session ENDS (t == T-1, or a new session starts at t+1), where
        targets[t] is the session's final item — a token `inputs` never
        carries. The wire is [B, T + E + W]: inputs, the per-lane boundary
        targets in order of occurrence (E slots), and the reset plane as an
        8-bits-per-word bitmask (W words). At B=256, T=50 that is 42 KB
        int16 vs ~205 KB of dict planes. Returns None (dict fallback) for
        non-canonical batches or windows with more than E session ends."""
        if "reset" not in batch or "targets" not in batch:
            return None
        inputs, targets = batch["inputs"], batch["targets"]
        mask, reset = batch["mask"], batch["reset"]
        B, T = inputs.shape
        Tc, E, W = self._session_wire_cols
        if T != Tc or mask.shape != targets.shape or not (mask == 1.0).all():
            return None
        rs = reset > 0
        end = np.concatenate([rs[:, 1:], np.ones((B, 1), bool)], axis=1)
        cont = ~end[:, :-1]
        if not (targets[:, :-1][cont] == inputs[:, 1:][cont]).all():
            return None  # not a packed next-item stream
        counts = end.sum(1)
        if counts.max() > E:
            return None  # denser than the boundary budget
        wire = np.zeros((B, T + E + W), self._wire_dtype)
        wire[:, :T] = inputs
        r_idx, t_idx = np.nonzero(end)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        j = np.arange(len(r_idx)) - np.repeat(starts, counts)
        wire[r_idx, T + j] = targets[r_idx, t_idx]
        pad = np.zeros((B, W * 8), np.int64)
        pad[:, :T] = rs
        wire[:, T + E:] = (
            pad.reshape(B, W, 8) << np.arange(8)
        ).sum(-1).astype(self._wire_dtype)
        return wire

    def _unpack_session_wire(self, packed: jax.Array) -> Dict[str, jax.Array]:
        """Device-side inverse of pack_session_batch (traced into the step)."""
        T, E, W = self._session_wire_cols
        B = packed.shape[0]
        inputs = packed[:, :T].astype(jnp.int32)
        bt = packed[:, T:T + E].astype(jnp.int32)
        words = packed[:, T + E:].astype(jnp.int32)
        t = jnp.arange(T)
        reset = (words[:, t // 8] >> (t % 8)) & 1  # [B, T]
        end = jnp.concatenate(
            [reset[:, 1:], jnp.ones((B, 1), jnp.int32)], axis=1
        )
        idx = jnp.maximum(jnp.cumsum(end, axis=1) - 1, 0)
        boundary = jnp.take_along_axis(bt, idx, axis=1)
        shifted = jnp.concatenate(
            [inputs[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1
        )
        return {
            "inputs": inputs,
            "targets": jnp.where(end == 1, boundary, shifted),
            "mask": jnp.ones((B, T), jnp.float32),
            "reset": reset.astype(jnp.float32),
        }

    def pack_batch(self, batch) -> Optional[np.ndarray]:
        """Config-dispatched wire packer (feeder side). Arrays pass through:
        the native session loader emits ready wire rows packed in C++."""
        if isinstance(batch, np.ndarray):
            return batch
        if self.cfg.data.session_parallel:
            return self.pack_session_batch(batch)
        return self.pack_train_batch(batch)

    def _unpack_wire(self, packed: jax.Array) -> Dict[str, jax.Array]:
        """Device-side inverse of pack_train_batch (traced into the step).
        Reconstructed `inputs` carries the sequence continuation at the
        first pad position instead of 0; that position is loss-masked and
        cannot reach any unmasked output (RNN state flows forward, causal
        attention looks backward), so loss and gradients are unchanged."""
        T = packed.shape[1] - 2
        tokens = packed[:, : T + 1].astype(jnp.int32)
        users = packed[:, T + 1].astype(jnp.int32)
        targets = tokens[:, 1:]
        return {
            "inputs": tokens[:, :-1],
            "targets": targets,
            "mask": (targets != 0).astype(jnp.float32),
            "users": users,
        }

    def put_batch(self, batch):
        if isinstance(batch, np.ndarray):
            # Pre-packed wire: [B, T+2] single or [K, B, T+2] group
            # (fit()'s steps_per_call grouping packs on the feeder thread).
            sh = (self._multi_batch_sharding if batch.ndim == 3
                  else self._batch_sharding)
            return jax.make_array_from_process_local_data(sh, batch)
        packed = (
            self.pack_batch(batch)
            if isinstance(batch, dict) and not isinstance(batch, DeclinedDict)
            else None
        )
        if packed is not None:
            return jax.make_array_from_process_local_data(
                self._batch_sharding, packed
            )
        out = {}
        for k, v in batch.items():
            out[k] = jax.make_array_from_process_local_data(
                self._batch_sharding, v
            )
        return out

    # ---- data ------------------------------------------------------------

    def train_iterator(
        self, skip_batches: int = 0
    ) -> Iterator[Tuple[int, Dict[str, np.ndarray]]]:
        """Training stream, optionally fast-forwarded past `skip_batches`
        already-consumed batches (checkpoint resume). Both bucketed loaders
        fast-forward analytically (SURVEY.md §5.4 "restores exactly" without
        O(steps) batch replay); the session-parallel stream replays — its
        lane state is genuinely sequential (fit() handles that case)."""
        host_shard = (jax.process_index(), jax.process_count())
        if self.cfg.data.session_parallel:
            return self._make_session_iterator()
        if self.cfg.data.use_native_loader:
            from seqrec_tpu.data import native

            if native.available():
                return native.NativeTrainLoader(
                    self.ds,
                    batch_size=self.local_batch,
                    max_len=self.cfg.data.max_len,
                    buckets=self.cfg.data.buckets,
                    seed=self.cfg.data.seed,
                    host_shard=host_shard,
                    skip_batches=skip_batches,
                )
        return make_train_batches(
            self.ds,
            batch_size=self.local_batch,
            max_len=self.cfg.data.max_len,
            buckets=self.cfg.data.buckets,
            seed=self.cfg.data.seed,
            host_shard=host_shard,
            skip_batches=skip_batches,
        )

    def _make_session_iterator(self, engine: str = "auto"):
        """Session-parallel stream: the native C++ engine when built (it
        fills windows AND packs the wire format off the GIL — the Python
        SessionStream's per-segment splice loop was the measured e2e
        bottleneck of this mode), else the Python stream. `engine` pins the
        kind when resuming a checkpoint written by the other loader (their
        shuffle engines differ, so snapshots are not interchangeable)."""
        host_shard = (jax.process_index(), jax.process_count())
        # Snapshot ring must cover the feeder's read-ahead: with
        # steps_per_call grouping the feeder stages whole K-groups, so the
        # gap between the stream head and the loop's position grows to
        # ~K * (prefetch_depth + 2) batches.
        spc = self._steps_per_call()
        depth = max(16, spc * (self.cfg.data.prefetch_to_device + 2) + spc)
        # engine == "native" (a native-engine checkpoint is being resumed)
        # overrides data.use_native_loader: the snapshot is only meaningful
        # to the engine that wrote it.
        use_native = engine == "native" or (
            self.cfg.data.use_native_loader and engine != "python"
        )
        if use_native:
            from seqrec_tpu.data import native

            if native.available():
                T, E, _ = self._session_wire_cols
                return native.NativeSessionLoader(
                    self.ds,
                    batch_size=self.local_batch,
                    window=T,
                    ends_budget=E,
                    wire_dtype=self._wire_dtype,
                    seed=self.cfg.data.seed,
                    host_shard=host_shard,
                    snapshot_depth=depth,
                )
        if engine == "native":
            raise RuntimeError(
                "checkpoint was written by the native session loader but "
                "the native engine is unavailable; run `make -C native`"
            )
        from seqrec_tpu.data.batching import make_session_stream

        return make_session_stream(
            self.ds,
            batch_size=self.local_batch,
            window=self.cfg.data.max_len,
            seed=self.cfg.data.seed,
            host_shard=host_shard,
            snapshot_depth=depth,
        )

    def precompile(self, state: TrainState) -> None:
        """AOT-compile one executable per bucket BEFORE the hot loop
        (SURVEY.md §7.3 item 3: no mid-training compile stalls)."""
        if self.cfg.data.session_parallel:
            buckets = (self.cfg.data.max_len,)  # one window shape
        else:
            buckets = self.cfg.data.buckets or (self.cfg.data.max_len,)
        session = self.cfg.data.session_parallel
        for b in buckets:
            dummy = {
                "inputs": np.zeros((self.local_batch, b), np.int32),
                "targets": np.zeros((self.local_batch, b), np.int32),
                "mask": np.zeros((self.local_batch, b), np.float32),
            }
            if session:
                dummy["reset"] = np.ones((self.local_batch, b), np.float32)
                # The dict fallback path (dense windows past the boundary
                # budget) must be compiled too; put_batch would pack this
                # dummy, so stage it as a raw dict deliberately.
                dummy["mask"][:, -1] = 0.0  # non-canonical -> dict ships
            else:
                dummy["users"] = np.zeros((self.local_batch,), np.int32)
            self._train_step.lower(state, self.put_batch(dummy)).compile()
            if session:
                T, E, W = self._session_wire_cols
                wire_cols = T + E + W
            else:
                wire_cols = b + 2
            wire = np.zeros((self.local_batch, wire_cols), self._wire_dtype)
            self._train_step.lower(state, self.put_batch(wire)).compile()
            spc = self._steps_per_call()
            if spc > 1:
                wires = np.zeros(
                    (spc, self.local_batch, wire_cols), self._wire_dtype
                )
                self._train_step_multi.lower(
                    state, self.put_batch(wires)
                ).compile()

    # ---- the loop --------------------------------------------------------

    def _steps_per_call(self) -> int:
        """Effective train.steps_per_call. debug_nans forces 1 (it needs
        per-step halt granularity); session-parallel groups fine — the TBPTT
        carry lives in TrainState and threads through the lax.scan exactly
        as it threads through separate calls."""
        spc = max(1, int(self.cfg.train.steps_per_call))
        if self.cfg.train.debug_nans:
            return 1
        return spc

    def fit(self, state: Optional[TrainState] = None) -> Tuple[TrainState, Dict[str, float]]:
        cfg = self.cfg
        out_dir = cfg.train.out_dir
        logger = MetricsLogger(out_dir, tensorboard=cfg.train.tensorboard)
        heartbeat = Heartbeat(out_dir) if out_dir else None
        ckpt = (
            CheckpointManager(
                os.path.join(out_dir, "ckpt"), keep=cfg.train.keep_checkpoints
            )
            if out_dir and cfg.train.checkpoint_every > 0
            else None
        )

        data_position = 0
        data_state = None
        if state is None:
            state = self.init_state()
            if cfg.train.resume and ckpt is not None and ckpt.latest_step() is not None:
                state, _, data_position, data_state = ckpt.restore(
                    abstract_like(state)
                )
        if jax.process_index() == 0 and out_dir:
            os.makedirs(out_dir, exist_ok=True)
            self.cfg.save(os.path.join(out_dir, "config.json"))

        it = self.train_iterator(skip_batches=data_position)
        if self.cfg.data.session_parallel and data_position:
            if data_state is not None:
                # O(1)-ish resume: rebuild lane cursors + rng from the saved
                # snapshot — no batch replay. The snapshot must be restored
                # by the loader kind that wrote it (python SessionStream vs
                # native engine: different shuffle rngs).
                want = data_state.get("engine", "python")
                have = ("native" if type(it).__name__ == "NativeSessionLoader"
                        else "python")
                if want != have:
                    if hasattr(it, "close"):
                        it.close()
                    it = self._make_session_iterator(engine=want)
                it.restore(data_state)
            else:
                for _ in range(data_position):  # legacy checkpoint: replay
                    next(it)

        self.precompile(state)

        def pipeline_state() -> Optional[dict]:
            """JSON snapshot of the stream position for checkpoint saves.
            The prefetcher's feeder thread reads ahead of the train loop, so
            the session stream keeps a ring of recent boundary snapshots and
            we ask for the one matching the loop's own position."""
            if self.cfg.data.session_parallel:
                return it.state_at(data_position)
            return None

        start_step = int(jax.device_get(state.step))

        # Multi-step grouping (train.steps_per_call): pack + stack K
        # consecutive same-bucket batches on the feeder side so the loop
        # below makes one dispatch + one transfer per K steps.
        spc = self._steps_per_call()
        if spc > 1 and 0 < cfg.train.log_every < spc:
            import warnings

            warnings.warn(
                f"train.log_every={cfg.train.log_every} < steps_per_call="
                f"{spc}: log boundaries inside a group collapse to one line "
                "per group (loss = group mean, grad_norm = group max)",
                stacklevel=2,
            )
        src: Iterator = it
        if spc > 1:
            src = _group_wires(
                it, self.pack_batch, spc,
                cfg.train.num_steps - start_step,
            )

        # Host→device prefetch (SURVEY.md §2 #16): stage upcoming batches in
        # HBM from a background thread so the hot loop below never blocks on
        # host batch assembly or the H2D copy. Built AFTER precompile and
        # resume fast-forward so the queue holds exactly the next batches.
        prefetcher: Optional[DevicePrefetcher] = None
        if cfg.data.prefetch_to_device > 0:
            prefetcher = DevicePrefetcher(
                src, self.put_batch, depth=cfg.data.prefetch_to_device
            )
            feed: Iterator = prefetcher
        else:
            feed = ((b, self.put_batch(h)) for b, h in src)
        pending: Optional[Dict[str, jax.Array]] = None
        pending_step = 0
        t_window = time.perf_counter()
        examples_window = 0
        last_eval: Dict[str, float] = {}
        profiling = False

        try:
          step = start_step
          while step < cfg.train.num_steps:
            bucket, batch = next(feed)
            # Grouped wire batches are [K, B, T+2] device arrays; everything
            # else (dict or single wire) is one step. Cadence checks below
            # fire when their boundary falls anywhere inside [step, hi).
            k = (
                batch.shape[0]
                if not isinstance(batch, dict) and batch.ndim == 3
                else 1
            )
            hi = step + k
            if (
                cfg.train.profile_dir
                and not profiling
                and step <= cfg.train.profile_steps[0] < hi
                and jax.process_index() == 0
            ):
                jax.profiler.start_trace(cfg.train.profile_dir)
                profiling = True
            data_position += k
            if k > 1:
                state, metrics = self._train_step_multi(state, batch)
            else:
                state, metrics = self._train_step(state, batch)
            examples_window += self.global_batch * k
            pending, pending_step = metrics, hi - 1

            if cfg.train.debug_nans and bool(
                jax.device_get(metrics["nonfinite"])
            ):
                # _steps_per_call() forces k == 1 here, so hi - 1 is the
                # exact failing step.
                if ckpt is not None:
                    ckpt.wait()
                logger.log(hi - 1, "fatal", {"nonfinite_grads_at": hi - 1})
                raise FloatingPointError(
                    f"non-finite loss/gradients at step {hi - 1} "
                    "(train.debug_nans); last finite checkpoint is intact"
                )

            if _crossed(cfg.train.log_every, step, hi):
                m = jax.device_get(pending)
                dt = time.perf_counter() - t_window
                eps = examples_window / dt if dt > 0 else 0.0
                logger.log(
                    pending_step,
                    "train",
                    {
                        "loss": m["loss"],
                        "grad_norm": m["grad_norm"],
                        "lr": float(self.schedule(pending_step)),
                        "bucket": bucket,
                        "examples_per_s": eps,
                        "examples_per_s_per_chip": eps / self.num_devices,
                    },
                )
                t_window = time.perf_counter()
                examples_window = 0
                if heartbeat:
                    heartbeat.beat(pending_step)

            if profiling and step <= cfg.train.profile_steps[1] < hi:
                jax.profiler.stop_trace()
                profiling = False

            if _crossed(cfg.train.eval_every, step, hi):
                last_eval = self.evaluate(state, split="val")
                logger.log(pending_step, "eval/val", last_eval)
                t_window = time.perf_counter()
                examples_window = 0

            if ckpt is not None and _crossed(
                cfg.train.checkpoint_every, step, hi
            ):
                ckpt.save(hi, state, data_position,
                          data_state=pipeline_state())

            if cfg.train.fail_after_step is not None and hi >= cfg.train.fail_after_step:
                if ckpt is not None:
                    if ckpt.latest_step() != hi:
                        ckpt.save(hi, state, data_position,
                                  data_state=pipeline_state())
                    ckpt.wait()
                logger.log(hi - 1, "fault_injection", {"exit_at": hi})
                return state, last_eval
            step = hi
        finally:
            if prefetcher is not None:
                prefetcher.close()

        if ckpt is not None:
            ckpt.save(cfg.train.num_steps, state, data_position,
                      data_state=pipeline_state())
            ckpt.close()
        if profiling:
            jax.profiler.stop_trace()
        logger.close()
        return state, last_eval

    # ---- eval -----------------------------------------------------------

    def evaluate(self, state: TrainState, split: str = "val") -> Dict[str, float]:
        return evaluate(
            self.model,
            state.params,
            self.ds,
            self.cfg.eval,
            split=split,
            max_len=self.cfg.data.max_len,
            mesh=self.mesh,
        )
