"""Shipped-config lint (VERDICT r4 #8): every `configs/*.json` must load,
validate, and construct a working Trainer.

Configs are the public API surface users actually touch; nothing else in the
suite fails when a shipped file drifts from the code's option space (a
renamed key, an invalid loss/optimizer combination, a sparse/session/sharded
composition the trainer rejects). Each config is loaded through the strict
`RunConfig` parser (unknown keys raise), then rebuilt against a tiny
synthetic dataset override and taken through `Trainer.__init__` +
`init_state()` — which runs every composition check (sparse_embed
.validate_config, mesh divisibility, session/bucketing rules) and
materializes sharded params on the fake 8-device mesh.
"""

import glob
import os

import pytest

from seqrec_tpu.config import RunConfig
from seqrec_tpu.data.dataset import synthetic_dataset
from seqrec_tpu.train.trainer import Trainer

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "configs")
CONFIG_PATHS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.json")))


def test_configs_present():
    # The shipped set (BASELINE.json configs + flagship variants). If a
    # config is deliberately removed, update this floor.
    assert len(CONFIG_PATHS) >= 10


def _tiny(cfg: RunConfig) -> RunConfig:
    """Shrink data/compute so 10 configs build in CPU-test time while
    keeping every structural knob (arch, loss, mesh, sparse, session,
    buckets) exactly as shipped."""
    cfg.data.dataset = "synthetic"
    cfg.data.synthetic_num_items = 1_000
    cfg.data.synthetic_num_users = 64
    cfg.data.synthetic_min_len = 3
    cfg.data.synthetic_max_len = 12
    cfg.data.batch_size = 4
    cfg.data.max_len = min(cfg.data.max_len, 16)
    cfg.model.max_len = cfg.data.max_len
    if cfg.data.buckets:
        cfg.data.buckets = tuple(
            sorted({min(b, cfg.data.max_len) for b in cfg.data.buckets})
        )
    cfg.model.embed_dim = min(cfg.model.embed_dim, 32)
    cfg.model.hidden_dim = None
    cfg.model.num_negatives = min(cfg.model.num_negatives, 64)
    if cfg.train.sparse_unique_budget:
        cfg.train.sparse_unique_budget = 128
    cfg.train.out_dir = ""
    cfg.train.checkpoint_every = 0
    cfg.train.eval_every = 0
    cfg.train.compilation_cache_dir = ""
    cfg.eval.batch_size = 4
    cfg.eval.num_negatives = 16
    return cfg


@pytest.mark.parametrize(
    "path", CONFIG_PATHS, ids=[os.path.basename(p) for p in CONFIG_PATHS]
)
def test_config_loads_and_builds_trainer(path):
    cfg = RunConfig.load(path)  # strict: unknown keys raise KeyError

    # Sanity on the shipped values themselves (pre-shrink).
    assert cfg.model.arch in ("gru4rec", "sasrec")
    assert cfg.model.loss in (
        "full_softmax", "sampled_softmax", "bpr", "top1", "bpr_max",
    )
    assert cfg.train.optimizer in ("adam", "adagrad", "sgd")
    assert cfg.eval.protocol in ("full", "sampled")
    if cfg.train.sparse_embedding_update:
        # Sparse updates require a sampled loss (train/sparse_embed.py).
        assert cfg.model.loss in ("sampled_softmax", "bpr", "top1", "bpr_max")
    if cfg.mesh.shard_embeddings:
        assert cfg.mesh.model_axis > 1

    cfg = _tiny(cfg)
    ds = synthetic_dataset(
        num_users=cfg.data.synthetic_num_users,
        num_items=cfg.data.synthetic_num_items,
        seed=0,
        min_len=cfg.data.synthetic_min_len,
        max_len=cfg.data.synthetic_max_len,
    )
    tr = Trainer(cfg, ds=ds)  # runs every composition validation
    state = tr.init_state()  # materializes (sharded) params + opt state
    assert int(state.step) == 0
