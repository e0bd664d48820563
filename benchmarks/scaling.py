"""Scaling-efficiency benchmark (SURVEY.md §2 #27; BASELINE.json 2-host target).

Sweeps mesh sizes over the available devices and reports examples/s and
parallel efficiency vs. the single-device run. On a real multi-chip slice
this measures ICI scaling; on the fake-device CPU mesh it only validates the
harness (all "devices" share one CPU — efficiency numbers are meaningless
there and flagged as such).

Usage: python -m benchmarks.scaling [--sizes 1,2,4,8] [--model_axis 1]
"""

from __future__ import annotations

import argparse
import json
from typing import List

import jax

from benchmarks.throughput import bench_config
from seqrec_tpu.runtime import make_mesh


def run_scaling(
    sizes: List[int],
    *,
    model_axis: int = 1,
    batch_size: int = 128,
    max_len: int = 50,
    steps: int = 100,
) -> List[dict]:
    results = []
    base_eps = None
    for n in sizes:
        if n > len(jax.devices()):
            break
        mesh = make_mesh(model_axis if n % max(model_axis, 1) == 0 else 1,
                         devices=jax.devices()[:n])
        cfg = bench_config(batch_size=batch_size, max_len=max_len)
        cfg.mesh.model_axis = mesh.shape["model"]
        cfg.mesh.shard_embeddings = mesh.shape["model"] > 1
        from seqrec_tpu.data.dataset import synthetic_dataset
        from seqrec_tpu.train.trainer import Trainer

        from benchmarks.timing import chain_slope_ms, fetch_scalar

        ds = synthetic_dataset(max(batch_size * n * 4, 512), 10_000, seed=0,
                               min_len=10, max_len=max_len + 1)
        tr = Trainer(cfg, ds=ds, mesh=mesh)
        state = tr.init_state()
        it = tr.train_iterator()
        staged = [tr.put_batch(next(it)[1]) for _ in range(4)]
        for i in range(10):
            state, m = tr._train_step(state, staged[i % 4])
        fetch_scalar(m["loss"])  # warm compile; block_until_ready lies on
        del state                # the relay — see benchmarks/timing.py

        def step(carry, i):
            new_state, _m = tr._train_step(carry, staged[i % 4])
            return new_state

        import numpy as np

        step_ms, detail = chain_slope_ms(step, tr.init_state, n_short=steps,
                                         n_long=3 * steps)
        # Same finite/reliable guard as benchmarks/throughput.py: a NaN
        # slope (no positive long-short gap) must not propagate into eps
        # and the efficiency ratios silently.
        finite = np.isfinite(step_ms) and step_ms > 0
        eps = tr.global_batch / (step_ms / 1e3) if finite else 0.0
        if base_eps is None:
            base_eps = eps
        results.append({
            "devices": n,
            "mesh": dict(mesh.shape),
            "examples_per_s": round(eps, 1),
            "efficiency_vs_1": (round(eps / (base_eps * n), 3)
                                if finite and base_eps else float("nan")),
            "reliable": bool(detail["reliable"]) and finite,
            "fake_devices": jax.default_backend() == "cpu",
        })
    return results


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="1,2,4,8")
    p.add_argument("--model_axis", type=int, default=1)
    p.add_argument("--steps", type=int, default=100)
    args = p.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    out = run_scaling(sizes, model_axis=args.model_axis, steps=args.steps)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
