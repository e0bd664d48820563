"""Session-parallel END-TO-END throughput (VERDICT r3 missing #2: the one
mode most likely to be host-bound had only a compute-only number).

Two configs, both on an rsc15-like short-session stream (mean ~4.5 items,
i.e. ~3.5 transitions per session — the regime session-packing exists for):

- ``gru64``: GRU-64, B=128, T=50, sampled_softmax S=256 — comparable to the
  committed compute-only row (BASELINE.md "Session-parallel (packed) step",
  0.70 ms / ~183k windows/s).
- ``rsc15``: the shipped configs/rsc15_gru4rec.json shape — GRU-100, B=256,
  T=50, bpr_max S=2048 (VERDICT r3 weak #3: this loss shape had no number
  at all; the XLA bpr_max head materializes [N=12800, S=2048] logits).

For each: compute-only (staged wire batches, upper bound) and e2e
(Trainer.fit's own loop — SessionStream feeder, pack_session_batch wire,
DevicePrefetcher) at steps_per_call K in {1, 16}. Windows are dense packed
transitions, so windows/s * T = real interactions/s with zero padding waste.

Usage: python -m benchmarks.session_e2e [gru64|rsc15 ...]
"""

from __future__ import annotations

import json
import sys

from benchmarks.throughput import (
    bench_config,
    run_benchmark,
    run_pipeline_alternating,
)
from seqrec_tpu.data.dataset import synthetic_dataset


def _session_ds(seed: int = 0):
    # Short sessions: lengths 2..8 (uniform) ~ rsc15's heavy-tail mean ~4.
    return synthetic_dataset(
        num_users=8192, num_items=10_000, seed=seed, min_len=2, max_len=9
    )


def _cfg(name: str):
    if name == "gru64":
        cfg = bench_config(
            arch="gru4rec", batch_size=128, max_len=50, embed_dim=64,
            num_items=10_000, loss="sampled_softmax", num_negatives=256,
        )
    elif name == "rsc15":
        cfg = bench_config(
            arch="gru4rec", batch_size=256, max_len=50, embed_dim=100,
            num_items=10_000, loss="bpr_max", num_negatives=2048,
        )
    else:
        raise SystemExit(f"unknown config {name!r}")
    cfg.data.session_parallel = True
    cfg.data.neg_sampler = "uniform"
    cfg.train.log_every = 1_000_000_000
    return cfg


def _round(d):
    return {k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in d.items()}


def main() -> int:
    args = sys.argv[1:]
    # Session steps are sub-ms at K=16; per-fit() setup (lane fill, native
    # engine spin-up) has ~100 ms-scale variance that only long chains
    # dwarf (DESIGN.md §5). 96-step chains measured 100-250% spreads;
    # --steps=480 puts chains at ~0.3-1.5 s.
    steps = 480
    names = [a for a in args if not a.startswith("--")] or ["gru64", "rsc15"]
    for a in args:
        if a.startswith("--steps="):
            steps = int(a.split("=", 1)[1])
    for name in names:
        ds = _session_ds()
        compute = run_benchmark(_cfg(name), steps=steps, warmup=5, ds=ds)
        print(json.dumps({
            "config": name, "mode": "compute_only", **_round(compute),
        }), flush=True)
        # K=1 vs K=16 pairwise-alternated (same-weather comparison + settle
        # + cross-rep spreads — DESIGN.md §5 r5 evidence rules).
        cfgs = {}
        for k in (1, 16):
            cfgs[f"e2e_k{k}"] = c = _cfg(name)
            c.train.steps_per_call = k
        both = run_pipeline_alternating(cfgs, steps=steps, warmup=5, ds=ds)
        for mode, e2e in both.items():
            print(json.dumps({
                "config": name, "mode": mode,
                "windows_per_s_per_chip": e2e["examples_per_s_per_chip"],
                "interactions_per_s_per_chip": round(
                    e2e["examples_per_s_per_chip"] * cfgs[mode].data.max_len,
                    1,
                ),
                **_round(e2e),
            }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
