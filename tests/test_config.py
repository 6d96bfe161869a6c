"""Config system: YAML typing, dotted overrides, struct-free access."""

import pytest

from depthg_tpu.config import Config, apply_overrides, cli_overrides, load_config


def test_yaml_sci_floats_and_overrides(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text("lr: 5e-4\ndim: 70\nflag: False\nnothing: ~\nnested:\n  a: 1\n")
    cfg = load_config(str(p), cli_overrides(["dim=90", "--nested.a", "2", "extra=1e-3"]))
    assert cfg.lr == pytest.approx(5e-4) and isinstance(cfg.lr, float)
    assert cfg.dim == 90
    assert cfg.flag is False
    assert cfg.nothing is None
    assert cfg.nested.a == 2
    assert cfg.extra == pytest.approx(1e-3)


def test_missing_raises_and_assignment_allowed():
    cfg = Config(a=1)
    with pytest.raises(AttributeError):
        _ = cfg.never_set
    cfg.b = 2  # struct-free: new keys allowed at runtime, like OmegaConf set_struct False
    assert cfg.b == 2


def test_cli_styles():
    assert cli_overrides(["a=1", "--b", "2"]) == ["a=1", "b=2"]
    with pytest.raises(ValueError):
        cli_overrides(["loose_arg"])


def test_roundtrip_yaml():
    cfg = Config(a=1, nested=Config(b=[1, 2]))
    assert "a: 1" in cfg.to_yaml()
