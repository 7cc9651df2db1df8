"""Config-system conveniences (reference config.py:73-87, 145-163,
767-800): env-var load modes, wildcard dataset expansion, git capture."""

import json
from pathlib import Path

import pytest

from tortoise_tts_tpu.config import Config, LoRAConfig


YAML = """
models:
- name: autoregressive
  training: true
dataset:
  training:
  - group/*
trainer:
  iterations: 3
"""


def _mk_env(tmp_path, n=3):
    (tmp_path / "cfg.yaml").write_text(YAML)
    for i in range(n):
        d = tmp_path / "data" / "group" / f"spk{i}"
        d.mkdir(parents=True)
    return tmp_path / "cfg.yaml"


def test_wildcard_dataset_expansion(tmp_path):
    """`group/*` expands against the config's data dir
    (reference config.py:767-800 expand)."""
    cfg = Config.load(_mk_env(tmp_path))
    assert cfg.dataset.training == ("group/spk0", "group/spk1",
                                    "group/spk2")


def test_wildcard_expansion_prefers_metadata(tmp_path):
    """Metadata-dir matches win over data-dir ones and keep the stem
    (the HDF5 key form)."""
    p = _mk_env(tmp_path)
    md = tmp_path / "metadata" / "group"
    md.mkdir(parents=True)
    (md / "spkA.json").write_text("{}")
    cfg = Config.load(p)
    assert cfg.dataset.training == ("group/spkA",)


def test_wildcard_no_match_raises_or_silent(tmp_path):
    (tmp_path / "cfg.yaml").write_text(YAML)
    with pytest.raises(ValueError):
        Config.load(tmp_path / "cfg.yaml")
    cfg = Config.load(tmp_path / "cfg.yaml", silent_errors=True)
    assert cfg.dataset.training == ()


def test_from_cli_env_modes(tmp_path, monkeypatch):
    """TORTOISE_YAML / TORTOISE_LORA env defaults
    (reference config.py:154-156)."""
    p = _mk_env(tmp_path)
    monkeypatch.setenv("TORTOISE_YAML", str(p))
    monkeypatch.setenv("TORTOISE_LORA", str(tmp_path / "lora.sft"))
    cfg = Config.from_cli([])
    assert cfg.trainer.iterations == 3
    assert cfg.lora is not None
    assert cfg.lora.path == str(tmp_path / "lora.sft")
    assert not cfg.lora.training

    # explicit flags beat the env
    (tmp_path / "cfg2.yaml").write_text("trainer: {iterations: 9}")
    cfg2 = Config.from_cli(["--yaml", str(tmp_path / "cfg2.yaml")])
    assert cfg2.trainer.iterations == 9

    # legacy `yaml=` form
    cfg3 = Config.from_cli([f"yaml={tmp_path / 'cfg2.yaml'}"])
    assert cfg3.trainer.iterations == 9


def test_git_capture_and_dump(tmp_path):
    """git commit/status are captured into the config dump
    (reference config.py:73-99)."""
    cfg = Config(yaml_path=str(tmp_path / "cfg.yaml"))
    out = cfg.dump()
    data = json.loads(Path(out).read_text())
    assert "git_commit" in data and "git_status" in data
    # this repo IS a git checkout, so the commit hash resolves
    assert len(cfg.git_commit) in (0, 40)
    assert data["trainer"]["iterations"] == cfg.trainer.iterations
