"""Config round-trip + override tests (SURVEY.md §4 unit tier)."""

import pytest

from seqrec_tpu.config import RunConfig


def test_json_round_trip(tmp_path):
    cfg = RunConfig()
    cfg.model.arch = "sasrec"
    cfg.data.buckets = (20, 50, 100)
    p = tmp_path / "cfg.json"
    cfg.save(str(p))
    loaded = RunConfig.load(str(p))
    assert loaded.model.arch == "sasrec"
    assert loaded.data.buckets == (20, 50, 100)
    assert loaded.to_dict() == cfg.to_dict()


def test_overrides():
    cfg = RunConfig().apply_overrides(
        ["train.learning_rate=0.01", "--model.arch=sasrec", "data.buckets=[10,20]"]
    )
    assert cfg.train.learning_rate == 0.01
    assert cfg.model.arch == "sasrec"
    assert cfg.data.buckets == (10, 20)


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        RunConfig().apply_overrides(["train.not_a_key=1"])
    with pytest.raises(KeyError):
        RunConfig.from_dict({"model": {"typo_field": 3}})


def test_hidden_defaults_to_embed_dim():
    cfg = RunConfig()
    cfg.model.embed_dim = 96
    assert cfg.model.hidden == 96
    cfg.model.hidden_dim = 128
    assert cfg.model.hidden == 128
