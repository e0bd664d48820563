"""CLI (L7): ``python -m seqrec_tpu {train,eval,prepare-data,benchmark} ...``.

Covers the reference's `main.py` flag-driven dispatch (SURVEY.md §3.1) with
subcommands + JSON config + dotted overrides:

    python -m seqrec_tpu train --config configs/ml100k_gru.json \
        --set train.num_steps=5000 --set model.embed_dim=128
    python -m seqrec_tpu eval --config ... --ckpt runs/x/ckpt --split test
    python -m seqrec_tpu prepare-data ml-1m --data_dir data
    python -m seqrec_tpu benchmark --config ... --steps 100
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import List, Optional

from seqrec_tpu.config import RunConfig


def _load_cfg(args) -> RunConfig:
    cfg = RunConfig.load(args.config) if args.config else RunConfig()
    if args.set:
        cfg = cfg.apply_overrides(args.set)
    return cfg


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--config", default=None, help="JSON config file")
    p.add_argument(
        "--set", action="append", default=[], metavar="KEY=VAL",
        help="dotted config override, e.g. train.learning_rate=1e-3",
    )
    p.add_argument("--coordinator", default=None,
                   help="multi-host coordinator address host:port")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)


def _init_runtime(args) -> None:
    from seqrec_tpu.runtime import init_distributed

    init_distributed(args.coordinator, args.num_processes, args.process_id)


def cmd_train(args) -> int:
    cfg = _load_cfg(args)
    _init_runtime(args)
    from seqrec_tpu.train.trainer import Trainer

    tr = Trainer(cfg)
    state, metrics = tr.fit()
    final = tr.evaluate(state, split="test")
    print(json.dumps({"final_test": final}))
    return 0


def cmd_eval(args) -> int:
    cfg = _load_cfg(args)
    _init_runtime(args)
    from seqrec_tpu.train.checkpoint import CheckpointManager, abstract_like
    from seqrec_tpu.train.trainer import Trainer

    tr = Trainer(cfg)
    state = tr.init_state()
    ckpt_dir = args.ckpt or f"{cfg.train.out_dir}/ckpt"
    mgr = CheckpointManager(ckpt_dir)
    state, step, _, _ = mgr.restore(abstract_like(state))
    m = tr.evaluate(state, split=args.split)
    print(json.dumps({"step": step, "split": args.split, **m}))
    return 0


def cmd_prepare_data(args) -> int:
    from seqrec_tpu.config import DataConfig
    from seqrec_tpu.data.dataset import prepare_dataset

    cfg = DataConfig(dataset=args.dataset, data_dir=args.data_dir)
    if args.config:
        cfg = RunConfig.load(args.config).data
    ds = prepare_dataset(args.dataset, args.data_dir, cfg)
    print(json.dumps({
        "dataset": args.dataset,
        "num_users": ds.num_users,
        "num_items": ds.vocab_size - 1,
        "num_interactions": int(len(ds.items)),
    }))
    return 0


def cmd_recommend(args) -> int:
    """Batch inference: JSON-lines histories in, top-k recommendations out."""
    cfg = _load_cfg(args)
    _init_runtime(args)
    import sys as _sys

    from seqrec_tpu.eval.infer import recommend
    from seqrec_tpu.train.checkpoint import CheckpointManager, abstract_like
    from seqrec_tpu.train.trainer import Trainer

    tr = Trainer(cfg)
    state = tr.init_state()
    ckpt_dir = args.ckpt or f"{cfg.train.out_dir}/ckpt"
    mgr = CheckpointManager(ckpt_dir)
    state, _, _, _ = mgr.restore(abstract_like(state))

    def read_histories():
        src = open(args.input) if args.input else _sys.stdin
        for line in src:
            line = line.strip()
            if line:
                yield json.loads(line)

    for out in recommend(
        tr.model, state.params, read_histories(),
        k=args.k, batch_size=args.batch_size, max_len=cfg.data.max_len,
        mesh=tr.mesh, exclude_history=not args.allow_repeats,
    ):
        print(json.dumps(out))
    return 0


def cmd_benchmark(args) -> int:
    cfg = _load_cfg(args)
    _init_runtime(args)
    from benchmarks.throughput import run_benchmark

    result = run_benchmark(cfg, steps=args.steps, warmup=args.warmup)
    print(json.dumps(result))
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(prog="seqrec_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train", help="train a model")
    _add_common(p)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("eval", help="evaluate a checkpoint")
    _add_common(p)
    p.add_argument("--ckpt", default=None, help="checkpoint dir")
    p.add_argument("--split", default="test", choices=["val", "test"])
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("prepare-data", help="build the canonical dataset format")
    p.add_argument("dataset", help="ml-100k | ml-1m | beauty | steam | synthetic")
    p.add_argument("--data_dir", default="data")
    p.add_argument("--config", default=None)
    p.set_defaults(fn=cmd_prepare_data)

    p = sub.add_parser("recommend", help="top-k recommendations for histories")
    _add_common(p)
    p.add_argument("--ckpt", default=None, help="checkpoint dir")
    p.add_argument("--input", default=None,
                   help="JSONL file of {'user':..,'history':[..]} (default stdin)")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--allow_repeats", action="store_true",
                   help="do not exclude items already in the history")
    p.set_defaults(fn=cmd_recommend)

    p = sub.add_parser("benchmark", help="measure examples/s/chip")
    _add_common(p)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--warmup", type=int, default=10)
    p.set_defaults(fn=cmd_benchmark)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
