"""Honest on-device timing through an async PJRT relay.

Measured fact about this environment (axon relay, one real v5e chip):
``jax.block_until_ready`` on a relay-backed array returns when the dispatch
is acknowledged, NOT when the computation finishes — a 200-step chain of
~1 ms train steps "blocks" in 20 ms while a subsequent host fetch of the
same value stalls for the full minute of queued work. Any timing loop built
on block_until_ready therefore measures dispatch throughput (~0.1 ms/call),
off by ~10x from the real step time.

The honest primitive, used by every benchmark in this repo:

- chains must be serially data-dependent (each step consumes the previous
  step's output), so the final value transitively requires every step;
- each timed chain ends with a HOST FETCH of a concrete scalar derived from
  the final carry (``float(...)`` / device_get) — the only operation the
  relay cannot acknowledge early;
- the reported number is the SLOPE between two chain lengths, which cancels
  the constant drain/round-trip latency of the fetch itself.

On backends with working synchronization (CPU, direct TPU) this measures
the same thing block_until_ready would, so it is safe everywhere.
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

Carry = Any


def fetch_scalar(carry: Carry) -> float:
    """Pull one concrete scalar derived from `carry` to the host, forcing
    every computation `carry` depends on to complete."""
    leaves = [l for l in jax.tree.leaves(carry) if hasattr(l, "dtype")]
    if not leaves:
        raise ValueError("carry has no array leaves to fetch")
    x = leaves[0]
    if jnp.issubdtype(x.dtype, jnp.integer) or jnp.issubdtype(
        x.dtype, jnp.floating
    ):
        return float(jnp.asarray(x).reshape(-1)[0])
    return float(jnp.asarray(x).view(jnp.uint8).reshape(-1)[0])


def _paired_slope(
    times: dict, n_short: int, n_long: int, reps: int
) -> Tuple[float, dict]:
    """Median per-rep positive slope from paired (short, long) chain timings.

    Pair each rep's (short, long) measured back-to-back: relay round-trip
    latency drifts over minutes, and mixing the min-short of one moment
    with the min-long of another can even make the slope NEGATIVE when
    chains are much shorter than the drift (seen with 20/60-step chains
    of a sub-ms model). Negative slopes are pure drift artifacts and are
    dropped; of the positive slopes we report the MEDIAN (upper median for
    even counts — the conservative middle element), not the minimum: with
    reps=4 a min-of-reps is an optimistic order statistic (VERDICT r3 weak
    #4), while the median of back-to-back pairs is drift-robust without
    the bias. Measured on-chip 2026-08-20: the estimator change moved the
    headline e2e number < 2% (the per-rep spread is small once chains are
    seconds long).
    """
    slopes = [
        (times[n_long][r] - times[n_short][r]) / (n_long - n_short) * 1e3
        for r in range(reps)
    ]
    positive = sorted(s for s in slopes if s > 0)
    slope = positive[len(positive) // 2] if positive else float("nan")
    # Cross-rep spread (max-min of the positive per-rep slopes): the error
    # bar every committed number must carry (VERDICT r4 weak #2 — deltas
    # acted on without knowing whether they exceed run-to-run variance).
    # A comparison whose delta sits inside the union of the two spreads is
    # noise, not evidence.
    spread = (positive[-1] - positive[0]) if positive else float("nan")
    # Signal strength: the long/short difference should dwarf drift (~10 ms
    # scale on this relay); below that, the number is noise.
    med_r = slopes.index(slope) if positive else 0
    diff_s = times[n_long][med_r] - times[n_short][med_r]
    try:
        # Host contention poisons e2e loops (loader/prefetch/dispatch are
        # host threads on a 2-core machine) — seen live: a concurrent
        # pytest run inflated per-rep slopes 1.5 → 30 ms. Record the load
        # average so a poisoned capture is self-diagnosing.
        load_1m = round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover - non-Linux
        load_1m = float("nan")
    return slope, {
        "host_load_1m": load_1m,
        "host_cpus": os.cpu_count(),
        "chain_short_s": times[n_short][med_r],
        "chain_long_s": times[n_long][med_r],
        "n_short": n_short,
        "n_long": n_long,
        "reps": reps,
        "slopes_ms": [round(s, 4) for s in slopes],
        "spread_ms": round(spread, 4) if spread == spread else spread,
        "spread_pct": (
            round(100.0 * spread / slope, 1)
            if positive and slope > 0
            else float("nan")
        ),
        "reliable": bool(positive) and diff_s > 0.05,
    }


def median_slope(detail: dict) -> float:
    """The reported slope of a `_paired_slope` detail (median of positive
    per-rep slopes), recomputed from `slopes_ms`. NaN when no positive rep."""
    positive = sorted(s for s in detail.get("slopes_ms", []) if s > 0)
    return positive[len(positive) // 2] if positive else float("nan")


def deltas_distinguishable(a: dict, b: dict) -> bool:
    """True when two `_paired_slope` details differ by more than the larger
    of their own cross-rep spreads — the repo's evidence rule for acting on
    a comparison (DESIGN.md §5; VERDICT r4 weak #2). Details lacking spread
    (NaN) are never distinguishable."""
    sa, sb = a.get("spread_ms", float("nan")), b.get("spread_ms", float("nan"))
    ma, mb = median_slope(a), median_slope(b)
    if not (sa == sa and sb == sb and ma == ma and mb == mb):
        return False
    return abs(ma - mb) > max(sa, sb)


def chain_slope_ms(
    step: Callable[[Carry, int], Carry],
    seed: Callable[[], Carry],
    *,
    n_short: int = 50,
    n_long: int = 150,
    reps: int = 4,
) -> Tuple[float, dict]:
    """Per-step wall time (ms) of `step`, fetch-terminated slope method.

    `step(carry, i) -> carry` must be serially dependent on `carry`. `seed()`
    must return FRESH device buffers each call (donated args are consumed).
    Returns (best_slope_ms, detail).
    """
    times = {n_short: [], n_long: []}
    c = None
    for _ in range(reps):
        for n in (n_short, n_long):
            # Release the previous chain's carry BEFORE seeding the next —
            # holding both doubles peak memory, which matters when the carry
            # is a multi-GB train state (10M-item sparse config).
            c = None
            c = step(seed(), 0)  # warm compile + drain marker
            fetch_scalar(c)  # queue is now empty
            t0 = time.perf_counter()
            for i in range(n):
                c = step(c, i + 1)
            fetch_scalar(c)
            times[n].append(time.perf_counter() - t0)
    return _paired_slope(times, n_short, n_long, reps)


def alternating_chain_slopes_ms(
    chains: "dict[str, Tuple[Callable, Callable]]",
    *,
    n_short: int = 50,
    n_long: int = 150,
    reps: int = 4,
) -> "dict[str, Tuple[float, dict]]":
    """chain_slope_ms for several (step, seed) candidates PAIRWISE-ALTERNATED
    (see alternating_run_slopes_ms for why): every rep times each
    candidate's (short, long) chain pair back-to-back, so per-rep
    comparisons between candidates sample the same relay weather. Required
    for committed kernel-gate decisions (DESIGN.md §5 r5 rules).

    Each candidate's jitted `step` must already be traced/compiled (call it
    once before) if its trace reads ambient state — e.g. a module-level
    tile override — so alternation cannot bake the wrong config.
    """
    times = {name: {n_short: [], n_long: []} for name in chains}
    for _ in range(reps):
        for name, (step, seed) in chains.items():
            for n in (n_short, n_long):
                c = step(seed(), 0)  # drain marker (already compiled)
                fetch_scalar(c)
                t0 = time.perf_counter()
                for i in range(n):
                    c = step(c, i + 1)
                fetch_scalar(c)
                times[name][n].append(time.perf_counter() - t0)
                c = None
    return {
        name: _paired_slope(times[name], n_short, n_long, reps)
        for name in chains
    }


def run_slope_ms(
    run: Callable[[int], None],
    *,
    n_short: int = 50,
    n_long: int = 150,
    reps: int = 4,
) -> Tuple[float, dict]:
    """Per-step wall time (ms) of a SELF-CONTAINED chain runner.

    `run(n)` must execute an n-step serially-dependent chain AND end with a
    host fetch of a value derived from the final carry (so the wall time of
    run(n) covers all n steps even through the async relay). Per-call setup
    (iterator construction, prefetch threads, compiled-executable lookup) is
    constant in n and cancels in the slope — this is how end-to-end loops
    like Trainer.fit are timed honestly.
    """
    times = {n_short: [], n_long: []}
    for _ in range(reps):
        for n in (n_short, n_long):
            t0 = time.perf_counter()
            run(n)
            times[n].append(time.perf_counter() - t0)
    return _paired_slope(times, n_short, n_long, reps)


def alternating_run_slopes_ms(
    runs: "dict[str, Callable[[int], None]]",
    *,
    n_short: int = 50,
    n_long: int = 150,
    reps: int = 5,
) -> "dict[str, Tuple[float, dict]]":
    """Time several self-contained chain runners PAIRWISE-ALTERNATED.

    Relay round-trip latency drifts over minutes (DESIGN.md §5: ±15%
    observed; BENCH_r04 showed cross-process swings up to ~1.7x). Two
    configurations timed in separate blocks can therefore differ by more
    than the effect being measured. This estimator interleaves all runners
    within every rep — rep r times runner A's (short, long) pair, then
    runner B's, then back to A for rep r+1 — so every runner samples the
    same relay weather, and per-rep RATIOS between runners (slopes_ms[r] of
    one over the other) are same-weather comparisons even when absolute
    slopes drift. This is the required method for any committed A-vs-B
    claim (steps_per_call grouping, kernel gates on e2e paths).

    Each `runs[name](n)` must execute an n-step serially-dependent chain
    ending in a host fetch (see run_slope_ms). Returns per-name
    (median_slope_ms, detail) with cross-rep spreads in the detail.
    """
    times = {name: {n_short: [], n_long: []} for name in runs}
    for _ in range(reps):
        for name, run in runs.items():
            for n in (n_short, n_long):
                t0 = time.perf_counter()
                run(n)
                times[name][n].append(time.perf_counter() - t0)
    return {
        name: _paired_slope(times[name], n_short, n_long, reps)
        for name in runs
    }
