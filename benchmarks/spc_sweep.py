"""Sweep train.steps_per_call END-TO-END on the headline config (VERDICT r3
task 1: the last 21% between the e2e and compute-only numbers is per-step host
dispatch + H2D transfer, and steps_per_call exists to amortize exactly that —
but no committed number ever exercised it).

Method: ONE Trainer shared across K values — the single-step executable and
the compiled init are built once; each K then adds only its own [K, B, T+2]
lax.scan executable. Each K's throughput is Trainer.fit's own loop (native
loader + DevicePrefetcher + wire format), timed with the fetch-terminated
slope (benchmarks/timing.py). Also prints a warmup breakdown (init vs.
precompile vs. first-fit) for the time-to-first-step budget (VERDICT r3 weak
#6).

Usage: python -m benchmarks.spc_sweep [K ...]   (default 1 2 4 8)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

from benchmarks.throughput import bench_config
from benchmarks.timing import (
    alternating_run_slopes_ms,
    deltas_distinguishable,
    fetch_scalar,
)
from seqrec_tpu.data.dataset import synthetic_dataset
from seqrec_tpu.train.trainer import Trainer


def _round(d):
    return {k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in d.items()}


def main() -> int:
    ks = [int(x) for x in sys.argv[1:]] or [1, 2, 4, 8]
    # Chain lengths divisible by every K up to 32: a non-multiple leaves a
    # tail of SINGLE-step dispatches (fit stops exactly at num_steps), and
    # at ~30 ms of relay overhead per single dispatch a 4-single tail can
    # dominate a grouped chain's slope.
    steps = 96

    cfg = bench_config(
        arch="gru4rec", batch_size=128, max_len=200, embed_dim=64,
        num_items=3_417, loss="sampled_softmax", num_negatives=256,
    )
    cfg.train.log_every = 1_000_000_000
    ds = synthetic_dataset(
        num_users=max(cfg.data.batch_size * 4, 512),
        num_items=cfg.data.synthetic_num_items,
        seed=cfg.data.seed,
        min_len=min(cfg.data.max_len, 20),
        max_len=cfg.data.max_len + 1,
    )
    tr = Trainer(cfg, ds=ds)

    # Warmup breakdown (the 765 s e2e warmup of BENCH_r03 was one opaque
    # number): compiled init, single-step AOT precompile, first fit().
    t0 = time.perf_counter()
    state = tr.init_state()
    fetch_scalar(state.step)
    t_init = time.perf_counter() - t0
    t0 = time.perf_counter()
    tr.precompile(state)
    t_pre = time.perf_counter() - t0
    del state
    print(json.dumps({
        "phase": "warmup_breakdown", "backend": __import__("jax").default_backend(),
        "init_s": round(t_init, 1), "precompile_single_step_s": round(t_pre, 1),
    }), flush=True)

    # All K values PAIRWISE-ALTERNATED in one process (VERDICT r4 weak #2:
    # sequential per-K blocks let relay drift exceed the K-to-K deltas —
    # the r4 sweep's K=1 row disagreed with bench.py's same-day e2e_k1 by
    # 15%). Compile every K's scan executable first, then one untimed
    # settle chain each, then interleaved timed reps.
    def make_run(k: int):
        def run(n: int) -> None:
            cfg.train.steps_per_call = k
            cfg.train.num_steps = n
            st, _ = tr.fit()
            fetch_scalar(st)
        return run

    runners = {f"k{k}": make_run(k) for k in ks}
    first_fit = {}
    for k in ks:
        t0 = time.perf_counter()
        runners[f"k{k}"](max(5, k))  # compiles this K's scan executable
        first_fit[k] = time.perf_counter() - t0
    for run in runners.values():  # settle: post-compile congestion discard
        run(steps)

    slopes = alternating_run_slopes_ms(
        runners, n_short=steps, n_long=3 * steps, reps=4
    )
    rows = []
    prev_detail = None
    for k in ks:
        step_ms, detail = slopes[f"k{k}"]
        finite = np.isfinite(step_ms) and step_ms > 0
        eps = tr.global_batch / (step_ms / 1e3) if finite else 0.0
        row = {
            "steps_per_call": k,
            "step_time_ms": round(step_ms, 4) if finite else float("nan"),
            "examples_per_s_per_chip": round(eps / tr.num_devices, 1),
            "first_fit_s": round(first_fit[k], 1),
            # Evidence flag: is this row's delta vs the previous K outside
            # both rows' own cross-rep spreads?
            "distinct_from_prev_k": (
                deltas_distinguishable(detail, prev_detail)
                if prev_detail is not None else None
            ),
            **_round(detail),
        }
        prev_detail = detail
        print(json.dumps(row), flush=True)
        rows.append(row)

    best = max(rows, key=lambda r: r["examples_per_s_per_chip"])
    print(json.dumps({
        "phase": "summary",
        "best_k": best["steps_per_call"],
        "best_eps_per_chip": best["examples_per_s_per_chip"],
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
