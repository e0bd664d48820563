"""Shape sweep with MFU (VERDICT r2 task 7 / BASELINE.json:2,5).

Times the compiled train step (compute-only, fetch-terminated slope) at the
shapes the SHIPPED configs run — not just the tiny latency-bound headline —
and reports FLOPs/step from XLA's own cost model plus MFU against the chip's
bf16 peak, so "fast" is defensible as a fraction of roofline rather than
only as a multiple of a slow CPU.

Run on the chip: `python -m benchmarks.shapes`. Rows land in BASELINE.md.
"""

from __future__ import annotations

import json
from typing import Dict, Optional

import jax

from benchmarks.throughput import bench_config, run_benchmark
from seqrec_tpu.config import RunConfig
from seqrec_tpu.data.dataset import synthetic_dataset
from seqrec_tpu.train.trainer import Trainer

# TPU v5e (this environment's chip): 197 TFLOP/s bf16 peak per chip.
PEAK_FLOPS = {"tpu": 197e12, "cpu": float("nan")}


def shipped_shapes() -> Dict[str, RunConfig]:
    """Compute shapes of the shipped configs (synthetic data, same dims)."""
    out: Dict[str, RunConfig] = {}

    # configs/ml1m_gru4rec.json-shaped (the bench.py headline).
    out["gru4rec_D64_T200_S256"] = bench_config(
        arch="gru4rec", batch_size=128, max_len=200, embed_dim=64,
        num_items=3_417, loss="sampled_softmax", num_negatives=256,
    )

    # configs/beauty_gru.json-shaped: wider tower, shorter sequences.
    out["gru4rec_2xD256_T50_S256"] = bench_config(
        arch="gru4rec", batch_size=128, max_len=50, embed_dim=256,
        num_layers=2, num_items=12_000, loss="sampled_softmax",
        num_negatives=256,
    )

    # configs/ml1m_lstm.json-shaped.
    cfg = bench_config(
        arch="gru4rec", batch_size=128, max_len=200, embed_dim=128,
        num_layers=2, num_items=3_417, loss="sampled_softmax",
        num_negatives=256,
    )
    cfg.model.cell_type = "lstm"
    cfg.model.residual = True
    out["lstm_2xD128_T200_S256"] = cfg

    # configs/ml1m_sasrec.json-shaped.
    out["sasrec_2xD64_T200_S256"] = bench_config(
        arch="sasrec", batch_size=128, max_len=200, embed_dim=64,
        num_layers=2, num_items=3_417, loss="sampled_softmax",
        num_negatives=256,
    )

    # MXU-feed demonstrations: the shipped research configs are small
    # (latency-bound on a v5e); these wider rows show MFU headroom is a
    # model-size property, not a framework ceiling.
    out["sasrec_2xD256_B256_T200_S512"] = bench_config(
        arch="sasrec", batch_size=256, max_len=200, embed_dim=256,
        num_layers=2, num_items=100_000, loss="sampled_softmax",
        num_negatives=512,
    )
    out["gru4rec_D512_B256_T200_S512"] = bench_config(
        arch="gru4rec", batch_size=256, max_len=200, embed_dim=512,
        num_items=100_000, loss="sampled_softmax", num_negatives=512,
    )

    # configs/rsc15_gru4rec.json's TRUE loss shape (VERDICT r3 weak #3):
    # session-parallel GRU-100 with bpr_max over S=2048 shared negatives —
    # the XLA head scores [N=B*T=12800, S=2048] logits; whether that
    # materializes in fwd+bwd is what the memory_analysis column answers.
    cfg = bench_config(
        arch="gru4rec", batch_size=256, max_len=50, embed_dim=100,
        num_items=37_000, loss="bpr_max", num_negatives=2048,
    )
    cfg.data.session_parallel = True
    cfg.data.neg_sampler = "uniform"
    out["gru4rec_D100_B256_T50_bprmax_S2048_session"] = cfg
    return out


def step_flops(cfg: RunConfig) -> tuple:
    """(FLOPs/step, temp bytes) of the compiled step per XLA's analyses.

    temp bytes is the executable's scratch allocation — it answers "does
    this loss shape materialize its [N, S] logits (and their cotangent)"
    directly from the compiler rather than from guesswork."""
    ds = synthetic_dataset(
        num_users=max(cfg.data.batch_size * 4, 512),
        num_items=cfg.data.synthetic_num_items,
        seed=cfg.data.seed,
        min_len=min(cfg.data.max_len, 20),
        max_len=cfg.data.max_len + 1,
    )
    tr = Trainer(cfg, ds=ds)
    state = tr.init_state()
    _, batch = next(tr.train_iterator())
    compiled = tr._train_step.lower(state, tr.put_batch(batch)).compile()
    flops = temp = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):  # older jax returns one dict per device
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
    except Exception:  # noqa: BLE001 — cost model may be absent on a backend
        pass
    try:
        ma = compiled.memory_analysis()
        temp = int(getattr(ma, "temp_size_in_bytes", 0))
    except Exception:  # noqa: BLE001
        pass
    return flops, temp


def main() -> int:
    import sys

    pats = sys.argv[1:]  # optional substring filters on shape names
    backend = jax.default_backend()
    peak = PEAK_FLOPS.get(backend, float("nan"))
    for name, cfg in shipped_shapes().items():
        if pats and not any(p in name for p in pats):
            continue
        flops, temp = step_flops(cfg)
        res = run_benchmark(cfg, steps=100, warmup=5)
        ms = res["step_time_ms"]
        row = {
            "shape": name,
            "step_time_ms": round(ms, 4),
            "examples_per_s_per_chip": round(res["examples_per_s_per_chip"], 1),
            "flops_per_step": flops,
            "mfu": (
                round(flops / (ms / 1e3) / peak, 4)
                if flops and ms == ms and peak == peak
                else None
            ),
            "temp_mb": round(temp / 1e6, 1) if temp is not None else None,
            "spread_ms": res["spread_ms"],
            "reliable": res["reliable"],
            "backend": backend,
        }
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
