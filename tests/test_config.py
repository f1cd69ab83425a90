import os

import pytest

from sota_imagenet_tpu import config as C


def test_schema_defaults():
    cfg = C.load(strict_env=False)
    assert cfg.loader.image_size == 224
    assert cfg.loader.batch_size == 256
    assert cfg.val_loader.batch_size == 250
    assert cfg.bn_momentum == 0.1
    assert cfg.init_gamma == 1.72
    assert cfg.run.bf16 is True


def test_compose_and_overrides(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("log:\n  exp_name: base_exp\noptim:\n  momentum: 0.9\n")
    exp = tmp_path / "exp.yaml"
    exp.write_text("defaults:\n  - /base@_here_\nlog:\n  exp_name: exp1\nloader:\n  image_size: 192\n")
    cfg = C.load(str(exp), overrides=["loader.batch_size=64", "+model.width=2"], strict_env=False)
    assert cfg.log.exp_name == "exp1"
    assert cfg.optim.momentum == 0.9  # from base
    assert cfg.loader.image_size == 192
    assert cfg.loader.batch_size == 64
    assert cfg.model.width == 2


def test_unknown_key_rejected(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("loader:\n  not_a_key: 1\n")
    with pytest.raises(KeyError):
        C.load(str(bad), strict_env=False)


def test_env_interpolation(tmp_path, monkeypatch):
    monkeypatch.setenv("IMAGENET_DIR", "/data/imagenet")
    f = tmp_path / "c.yaml"
    f.write_text("loader:\n  root_data_dir: ${env:IMAGENET_DIR}\n")
    cfg = C.load(str(f), strict_env=False)
    assert cfg.loader.root_data_dir == "/data/imagenet"


def test_self_interpolation(tmp_path):
    f = tmp_path / "c.yaml"
    f.write_text("init_gamma: 2.0\nmodel:\n  _target_: CModel\n  gamma: '${init_gamma}'\n")
    cfg = C.load(str(f), strict_env=False)
    assert cfg.model.gamma == 2.0  # type preserved for whole-string interp


def test_parse_stages_contiguity():
    stages = C.parse_stages([dict(start=0, end=8, lr=[0.001, 1.0]), dict(start=8, end=90, lr=[1.0, 0], lr_mode="cos")])
    assert stages[0].lr == (0.001, 1.0)
    assert stages[1].lr_mode == "cos"
    with pytest.raises(ValueError):
        C.parse_stages([dict(start=0, end=8), dict(start=9, end=90)])
    with pytest.raises(ValueError):
        C.parse_stages([dict(start=0, end=0)])


def test_instantiate_resnet():
    m = C.instantiate({"_target_": "pytorch_tools.models.resnet50"})
    assert m.layers == (3, 4, 6, 3)
    m2 = C.instantiate({"_target_": "resnet18"})
    assert m2.layers == (2, 2, 2, 2)
