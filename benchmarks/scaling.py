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
    # Fenced (VERDICT r4 #9): on the fake-device CPU mesh all "devices"
    # share one CPU, so efficiency-vs-1 is meaningless by construction and
    # this path must not emit it. Scaling *evidence* in this 1-chip
    # environment comes from `--analyze` (emitted-collective volume model).
    if jax.default_backend() == "cpu":
        raise RuntimeError(
            "run_scaling refuses to time fake CPU devices: efficiency "
            "numbers would be meaningless (devices share one CPU). Use "
            "`python -m benchmarks.scaling --analyze <config>` for the "
            "emitted-collective scaling model, or run on a real multi-chip "
            "slice."
        )
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


_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
    "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}

_COLLECTIVE_RE = None  # compiled lazily (keeps import light)


def collective_bytes(hlo_text: str) -> dict:
    """Per-collective-kind output bytes of every collective op in an HLO
    dump. Conservative proxy for per-step wire volume: ring all-reduce
    moves ~2x its operand bytes per device, all-gather/reduce-scatter ~1x
    (the (N-1)/N factor is dropped — counts as 1)."""
    import re

    global _COLLECTIVE_RE
    if _COLLECTIVE_RE is None:
        _COLLECTIVE_RE = re.compile(
            r"=\s*(?:\(([^)]*)\)|((?:f|bf|s|u|pred)[0-9]*\[[0-9,]*\]))"
            r"[^=]*?\b"
            r"(all-reduce|all-gather|reduce-scatter|all-to-all|"
            r"collective-permute)\b"
        )
    shape_re = re.compile(r"((?:f|bf|s|u)[0-9]+|pred)\[([0-9,]*)\]")
    out: dict = {}
    for m in _COLLECTIVE_RE.finditer(hlo_text):
        shapes = m.group(1) if m.group(1) is not None else m.group(2)
        kind = m.group(3)
        total = 0
        for dt, dims in shape_re.findall(shapes):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * _DTYPE_BYTES.get(dt, 4)
        factor = 2 if kind == "all-reduce" else 1
        out[kind] = out.get(kind, 0) + total * factor
    out["total"] = sum(v for k, v in out.items() if k != "total")
    return out


def analyze(config_path: str, n_devices: int = 8) -> dict:
    """HARDWARE-BLOCKED scaling evidence (1 real chip in this environment):
    compile the config's real train step on an n-device fake mesh, read the
    collective ops XLA ACTUALLY emits from the compiled HLO, and model the
    per-step communication time at published v5e link rates. Not a
    measurement of scaling — a measurement of the program's wire volume,
    plus arithmetic. Prints per-kind bytes so the model is auditable."""
    import numpy as np

    from seqrec_tpu.config import RunConfig
    from seqrec_tpu.data.dataset import synthetic_dataset
    from seqrec_tpu.train.trainer import Trainer

    cfg = RunConfig.load(config_path)
    cfg.train.out_dir = ""
    cfg.train.checkpoint_every = 0
    cfg.train.eval_every = 0
    # Keep dataset/table construction cheap. The vocab cap does NOT change
    # the measured collective volume as long as it stays ABOVE the step's
    # touched-id budget K = B*T*2 + S: every collective in the
    # sparse-sharded step moves [K, D] sub-tables, [K] id vectors, or tower
    # gradients — table rows themselves never cross the wire (that is the
    # design), so the emitted shapes depend on K and D, not V. (A cap below
    # K would clamp the unique budget to the table size and fake
    # table-sized collectives.)
    cfg.data.synthetic_num_users = min(cfg.data.synthetic_num_users, 4096)
    cfg.data.synthetic_num_items = min(cfg.data.synthetic_num_items, 1_000_000)
    mesh = make_mesh(cfg.mesh.model_axis, devices=jax.devices()[:n_devices])
    ds = synthetic_dataset(
        cfg.data.synthetic_num_users, cfg.data.synthetic_num_items, seed=0,
        min_len=cfg.data.synthetic_min_len,
        max_len=max(cfg.data.synthetic_max_len, cfg.data.synthetic_min_len + 2),
    )
    tr = Trainer(cfg, ds=ds, mesh=mesh)
    state = tr.init_state()
    _, batch = next(tr.train_iterator())
    compiled = tr._train_step.lower(state, tr.put_batch(batch)).compile()
    per_step = collective_bytes(compiled.as_text())
    spc = tr._steps_per_call()
    # ICI (intra-slice) ~ 186 GB/s/link bidirectional on v5e; DCN
    # (cross-slice) ~ 25 GB/s effective per host. Both stated so the model
    # is re-derivable with other constants.
    model = {}
    for name, bw in (("ici_186GBps", 186e9), ("dcn_25GBps", 25e9)):
        model[name + "_comm_ms"] = round(per_step["total"] / bw * 1e3, 4)
    return {
        "config": config_path,
        "n_devices": n_devices,
        "mesh": dict(mesh.shape),
        "steps_per_call": spc,
        "collective_bytes_per_step": per_step,
        "modeled": model,
        "note": "program-emitted collective volume + bandwidth arithmetic; "
                "NOT a multi-chip measurement (1 real chip available)",
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="1,2,4,8")
    p.add_argument("--model_axis", type=int, default=1)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--analyze", default=None,
                   help="config path: emit the collective-volume scaling "
                        "model instead of timing (see analyze())")
    args = p.parse_args()
    if args.analyze:
        import os

        if os.environ.get("JAX_PLATFORMS") == "cpu":
            # The axon boot hook pins jax_platforms="axon,cpu", which beats
            # the env var — honor an explicit CPU request (fake devices).
            jax.config.update("jax_platforms", "cpu")
        print(json.dumps(analyze(args.analyze)))
        return 0
    sizes = [int(s) for s in args.sizes.split(",")]
    out = run_scaling(sizes, model_axis=args.model_axis, steps=args.steps)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
