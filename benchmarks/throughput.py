"""Throughput benchmark harness (SURVEY.md §2 #27): examples/s/chip.

Times the steady-state compiled train step over synthetic data (no host IO in
the timed region — batches are staged to device up front). Timing uses the
fetch-terminated slope method from `benchmarks.timing`: on the axon relay,
``block_until_ready`` acknowledges dispatch without waiting for compute, so
naive chain timing measures dispatch throughput and overstates examples/s
~10x (measured; see benchmarks/timing.py). `run_benchmark` is used by both
the CLI `benchmark` subcommand and the repo-root `bench.py`.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import jax
import numpy as np

from benchmarks.timing import (
    alternating_run_slopes_ms,
    chain_slope_ms,
    fetch_scalar,
    run_slope_ms,
)
from seqrec_tpu.config import RunConfig
from seqrec_tpu.data.dataset import synthetic_dataset
from seqrec_tpu.train.trainer import Trainer


def run_benchmark(
    cfg: RunConfig,
    *,
    steps: int = 100,
    warmup: int = 10,
    num_staged_batches: int = 8,
    ds=None,
) -> Dict[str, float]:
    """`ds` overrides the default long-sequence synthetic dataset — the
    session-parallel benchmark passes a short-session (rsc15-like) stream."""
    if ds is None:
        ds = synthetic_dataset(
            num_users=max(cfg.data.batch_size * 4, 512),
            num_items=cfg.data.synthetic_num_items,
            seed=cfg.data.seed,
            min_len=min(cfg.data.max_len, 20),
            max_len=cfg.data.max_len + 1,
        )
    tr = Trainer(cfg, ds=ds)

    # Stage a few distinct batches on device; cycle through them.
    it = tr.train_iterator()
    staged = []
    for _ in range(num_staged_batches):
        _, batch = next(it)
        staged.append(tr.put_batch(batch))

    # Warmup (includes compile).
    t_compile = time.perf_counter()
    state = tr.init_state()
    for i in range(max(warmup, 1)):
        state, metrics = tr._train_step(state, staged[i % len(staged)])
    fetch_scalar(metrics["loss"])
    warmup_s = time.perf_counter() - t_compile
    del state

    def step(carry, i):
        new_state, _metrics = tr._train_step(carry, staged[i % len(staged)])
        return new_state

    # The train step donates its input state, so each chain seeds fresh
    # buffers via the compiled init.
    step_ms, detail = chain_slope_ms(
        step, tr.init_state, n_short=steps, n_long=3 * steps
    )
    finite = np.isfinite(step_ms) and step_ms > 0
    eps = tr.global_batch / (step_ms / 1e3) if finite else 0.0

    n_dev = tr.num_devices
    return {
        "steps": steps,
        "global_batch": tr.global_batch,
        "seq_len": cfg.data.max_len,
        "num_devices": n_dev,
        "step_time_ms": step_ms if finite else float("nan"),
        "examples_per_s": eps,
        "examples_per_s_per_chip": eps / n_dev,
        "chain_short_s": detail["chain_short_s"],
        "chain_long_s": detail["chain_long_s"],
        "slopes_ms": detail["slopes_ms"],
        "spread_ms": detail["spread_ms"],
        "spread_pct": detail["spread_pct"],
        "host_load_1m": detail["host_load_1m"],
        # False when the long/short wall-time gap is inside relay drift —
        # rerun with more `steps` before trusting the number.
        "reliable": detail["reliable"],
        "warmup_s": warmup_s,
        "backend": jax.default_backend(),
    }


def make_pipeline_runner(cfg: RunConfig, ds=None):
    """Build (trainer, run) where ``run(n)`` executes ``Trainer.fit``'s OWN
    end-to-end loop for n steps and ends with a host fetch of the final
    state — a valid fetch-terminated chain (the train state threads through
    every step). Config is forced bare: no checkpoints, no eval, no
    per-step host syncs."""
    if ds is None:
        ds = synthetic_dataset(
            num_users=max(cfg.data.batch_size * 4, 512),
            num_items=cfg.data.synthetic_num_items,
            seed=cfg.data.seed,
            min_len=min(cfg.data.max_len, 20),
            max_len=cfg.data.max_len + 1,
        )
    cfg.train.out_dir = ""
    cfg.train.checkpoint_every = 0
    cfg.train.eval_every = 0
    cfg.train.log_every = 1_000_000_000
    cfg.train.debug_nans = False
    tr = Trainer(cfg, ds=ds)

    def run(n: int) -> None:
        cfg.train.num_steps = n
        state, _ = tr.fit()
        fetch_scalar(state)

    return tr, run


def _pipeline_result(tr, cfg, step_ms, detail, warmup_s) -> Dict[str, float]:
    finite = np.isfinite(step_ms) and step_ms > 0
    eps = tr.global_batch / (step_ms / 1e3) if finite else 0.0
    n_dev = tr.num_devices
    return {
        "steps": detail["n_short"],
        "global_batch": tr.global_batch,
        "seq_len": cfg.data.max_len,
        "num_devices": n_dev,
        "step_time_ms": step_ms if finite else float("nan"),
        "examples_per_s": eps,
        "examples_per_s_per_chip": eps / n_dev,
        "chain_short_s": detail["chain_short_s"],
        "chain_long_s": detail["chain_long_s"],
        "slopes_ms": detail["slopes_ms"],
        "spread_ms": detail["spread_ms"],
        "spread_pct": detail["spread_pct"],
        "host_load_1m": detail["host_load_1m"],
        "reliable": detail["reliable"],
        "warmup_s": warmup_s,
        "loader": "native" if _native_loader_active(cfg) else "python",
        "prefetch_depth": cfg.data.prefetch_to_device,
        "backend": jax.default_backend(),
    }


def run_pipeline_benchmark(
    cfg: RunConfig,
    *,
    steps: int = 100,
    warmup: int = 5,
    ds=None,
) -> Dict[str, float]:
    """END-TO-END throughput: times ``Trainer.fit``'s OWN loop — native (or
    Python) loader, ``DevicePrefetcher`` H2D staging, and the compiled step —
    not a staged-batch compute proxy (VERDICT r2 missing #2; SURVEY.md §2 #16).

    Method: fetch-terminated slope between a short and a long ``fit`` run,
    which cancels per-call setup (iterator build, prefetch thread spin-up,
    executable-cache lookup, state init). `ds` as in run_benchmark. With
    cfg.train.steps_per_call set, pick `steps` divisible by it (a
    non-multiple tail degrades to single dispatches and skews the slope).
    For an A-vs-B comparison between configs use
    ``run_pipeline_alternating`` instead — separate blocks of this function
    sample different relay weather (VERDICT r4 weak #1)."""
    tr, run = make_pipeline_runner(cfg, ds=ds)

    t_compile = time.perf_counter()
    run(max(warmup, 1))  # compile (init + per-bucket step executables)
    warmup_s = time.perf_counter() - t_compile

    step_ms, detail = run_slope_ms(run, n_short=steps, n_long=3 * steps)
    return _pipeline_result(tr, cfg, step_ms, detail, warmup_s)


def run_pipeline_alternating(
    cfgs: "Dict[str, RunConfig]",
    *,
    steps: int = 96,
    warmup: int = 5,
    reps: int = 5,
    settle: bool = True,
    ds=None,
) -> "Dict[str, Dict[str, float]]":
    """End-to-end throughput for several configs, PAIRWISE-ALTERNATED in one
    process (timing.alternating_run_slopes_ms): every rep times each
    config's (short, long) chains back-to-back, so all configs sample the
    same relay weather and per-rep ratios are same-weather comparisons.
    This is the repo's evidence rule for any committed A-vs-B claim
    (DESIGN.md §5; VERDICT r4 weak #1/#2).

    ``settle=True`` runs one UNTIMED short chain per config after all
    compiles finish, so a multi-minute cold compile (BENCH_r04 paid 404 s)
    cannot bleed post-compile relay congestion into the first timed rep.
    ``steps`` must be divisible by every config's steps_per_call.
    """
    runners, trainers, warmups = {}, {}, {}
    for name, cfg in cfgs.items():
        tr, run = make_pipeline_runner(cfg, ds=ds)
        t0 = time.perf_counter()
        run(max(warmup, 1))
        warmups[name] = time.perf_counter() - t0
        trainers[name], runners[name] = tr, run

    settle_s = 0.0
    if settle:
        t0 = time.perf_counter()
        for run in runners.values():
            run(steps)
        settle_s = time.perf_counter() - t0

    slopes = alternating_run_slopes_ms(
        runners, n_short=steps, n_long=3 * steps, reps=reps
    )
    out = {}
    for name, (step_ms, detail) in slopes.items():
        r = _pipeline_result(
            trainers[name], cfgs[name], step_ms, detail, warmups[name]
        )
        r["settle_s"] = settle_s
        out[name] = r
    return out


def _native_loader_active(cfg: RunConfig) -> bool:
    if not cfg.data.use_native_loader:
        return False
    from seqrec_tpu.data import native

    return native.available()


def bench_config(
    arch: str = "gru4rec",
    *,
    batch_size: int = 256,
    max_len: int = 50,
    embed_dim: int = 64,
    num_items: int = 10_000,
    loss: str = "full_softmax",
    use_pallas: bool = True,
    num_layers: int = 1,
    num_negatives: Optional[int] = None,
) -> RunConfig:
    cfg = RunConfig()
    cfg.model.arch = arch
    cfg.model.embed_dim = embed_dim
    cfg.model.num_layers = num_layers
    cfg.model.max_len = max_len
    cfg.model.loss = loss
    if num_negatives is not None:
        cfg.model.num_negatives = num_negatives
    cfg.model.dropout_rate = 0.0
    cfg.model.use_pallas = use_pallas
    cfg.data.batch_size = batch_size
    cfg.data.max_len = max_len
    cfg.data.synthetic_num_items = num_items
    cfg.train.out_dir = ""
    cfg.train.checkpoint_every = 0
    cfg.train.eval_every = 0
    return cfg
