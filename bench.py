"""Repo-root benchmark entry: prints ONE JSON line with the headline metric.

Headline (BASELINE.json:2): examples/s/chip on the MovieLens-1M-shaped
GRU4Rec next-item config (vocab ~3.4k items, T=200 bucketed to 50 here for
the dominant bucket, sampled softmax), run on the default backend (the real
TPU chip under the driver).

`vs_baseline` divides by the committed single-process CPU reference number
(BASELINE.md; measured on this machine's host CPU with the identical config
and pure-XLA ops). Driver target: >= 3x (BASELINE.json:5).

Timing is the fetch-terminated slope method (benchmarks/timing.py): on the
axon relay block_until_ready does not wait for compute, so earlier naive
chain timings overstated throughput ~10x. Both the TPU number and the CPU
baseline below were (re)measured with the honest method (2026-08-18).
"""

import json
import sys

# Measured on this host's CPU with the identical config and pure-XLA ops:
# python bench.py --cpu  -> examples_per_s_per_chip (2026-08-18,
# fetch-terminated slope; see BASELINE.md "measured CPU baseline").
CPU_BASELINE_EPS = 249.95


def main() -> int:
    if "--cpu" in sys.argv:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["SEQREC_FORCE_XLA_OPS"] = "1"
        import jax

        # The axon boot hook pins jax_platforms="axon,cpu"; override it.
        jax.config.update("jax_platforms", "cpu")

    from benchmarks.throughput import bench_config, run_benchmark

    cfg = bench_config(
        arch="gru4rec",
        batch_size=128,
        max_len=200,
        embed_dim=64,
        num_items=3_417,  # ML-1M catalog size
        loss="sampled_softmax",
    )
    # TPU: 100/300-step chains (~ms steps, seconds per chain). CPU: seconds
    # per STEP, so tiny chains — the slope still cancels constant overhead.
    steps = 4 if "--cpu" in sys.argv else 100
    result = run_benchmark(cfg, steps=steps, warmup=5)
    eps = result["examples_per_s_per_chip"]
    print(
        json.dumps(
            {
                "metric": "examples_per_s_per_chip_ml1m_gru4rec",
                "value": round(eps, 2),
                "unit": "examples/s/chip",
                "vs_baseline": round(eps / CPU_BASELINE_EPS, 3),
                "detail": {k: (round(v, 3) if isinstance(v, float) else v)
                           for k, v in result.items()},
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
