"""Config loader tests incl. reference-yaml compatibility."""

import pytest

from dvmatcher_tpu.utils import load_config


def test_builtin_configs_load():
    for name in ("scape_r", "scape_r_nodino", "scape_partial", "scape_mini"):
        cfg = load_config(name)
        assert "expname" in cfg and cfg["loss"]["k_deform"] == 10


def test_reference_yaml_loads():
    """The reference's own config files parse through our loader."""
    cfg = load_config("/root/reference/config/scape_r.yaml")
    assert cfg["with_dino"] is True
    assert cfg["loss"]["w_dist"] == 0.02
    assert cfg["training"]["batch_size"] == 2
    assert cfg["optimizer"]["decay_iter"] == 10


def test_unknown_key_raises(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("expname: x\nnot_a_key: 1\n")
    with pytest.raises(KeyError):
        load_config(str(p))


def test_loss_config_from():
    from dvmatcher_tpu.cli.train import loss_config_from

    cfg = load_config("scape_partial")
    lc = loss_config_from(cfg)
    assert lc.partial is True
    assert lc.w_deform == 1000
    assert lc.k_dist == 300
