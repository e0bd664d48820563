"""Eval-harness throughput: wall-clock users/s of `evaluate()` on the chip.

Times the SECOND call of each protocol (the first pays the compiled-step
build; `evaluate` returns host floats, so each call is fetch-synchronized
end to end — no relay-acknowledgement distortion). Covers the full-catalog
protocol (dense path at this vocab) and the sampled 1-vs-N protocol whose
candidate drawing is the vectorized host-side sampler (BASELINE.md "Eval
candidate sampling").

Usage: python -m benchmarks.eval_bench
"""

from __future__ import annotations

import json
import time

from seqrec_tpu.config import RunConfig
from seqrec_tpu.data.dataset import synthetic_dataset
from seqrec_tpu.eval.harness import evaluate
from seqrec_tpu.train.trainer import Trainer


def main() -> int:
    cfg = RunConfig()
    cfg.model.arch = "gru4rec"
    cfg.model.embed_dim = 64
    cfg.model.max_len = 200
    cfg.model.dropout_rate = 0.0
    cfg.data.batch_size = 128
    cfg.data.max_len = 200
    cfg.train.out_dir = ""
    ds = synthetic_dataset(8192, 3_417, seed=0, min_len=20, max_len=201)
    tr = Trainer(cfg, ds=ds)
    state = tr.init_state()

    for protocol in ("full", "sampled"):
        cfg.eval.protocol = protocol
        cfg.eval.num_negatives = 100
        times = []
        for rep in range(3):
            t0 = time.perf_counter()
            m = evaluate(tr.model, state.params, ds, cfg.eval, split="test",
                         max_len=cfg.data.max_len, mesh=tr.mesh)
            times.append(time.perf_counter() - t0)
        users = m["count"]
        best = min(times[1:])  # post-compile
        print(json.dumps({
            "protocol": protocol,
            "users": users,
            "eval_s": round(best, 3),
            "users_per_s": round(users / best, 1),
            "first_call_s": round(times[0], 3),
            "ks": list(cfg.eval.ks),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
