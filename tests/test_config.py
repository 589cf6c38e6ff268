import os

import pytest

from fact_clip_tpu.configs.default import get_cfg_defaults
from fact_clip_tpu.configs.node import CfgNode
from fact_clip_tpu.configs.utils import cfg2flatdict, generate_diff_dict, setup_cfg, update_from


def test_defaults_schema():
    cfg = get_cfg_defaults()
    # spot-check schema parity with the reference default config
    assert cfg.FACT.block == "iuUU"
    assert cfg.Bi.hid_dim == 512
    assert cfg.Bu.hid_dim is None
    assert cfg.Loss.match == "o2o"
    assert cfg.CLIP.temp == 0.07
    assert cfg.holdout_classes == []
    assert cfg.TPU.bucket_multiple == 128


def test_clone_independent():
    a = get_cfg_defaults()
    b = a.clone()
    b.FACT.ntoken = 99
    assert a.FACT.ntoken == 30


def test_freeze():
    cfg = get_cfg_defaults()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.FACT.ntoken = 1
    cfg.defrost()
    cfg.FACT.ntoken = 1
    assert cfg.FACT.ntoken == 1


def test_merge_from_file(tmp_path):
    yaml_text = """
FACT:
  block: iu
  ntoken: 60
Bi:
  a_dim: 128
lr: 0.0001
optimizer: Adam
"""
    f = tmp_path / "test.yaml"
    f.write_text(yaml_text)
    cfg = get_cfg_defaults()
    cfg.merge_from_file(str(f))
    assert cfg.FACT.block == "iu"
    assert cfg.FACT.ntoken == 60
    assert cfg.Bi.a_dim == 128
    assert cfg.lr == 0.0001
    # untouched keys keep defaults
    assert cfg.Bi.hid_dim == 512


def test_merge_unknown_key_rejected(tmp_path):
    f = tmp_path / "bad.yaml"
    f.write_text("nonexistent_key: 3\n")
    cfg = get_cfg_defaults()
    with pytest.raises(KeyError):
        cfg.merge_from_file(str(f))


def test_merge_from_list_int2float():
    cfg = setup_cfg([], ["lr", "1", "FACT.ntoken", "50"])
    assert cfg.lr == 1.0 and isinstance(cfg.lr, float)
    assert cfg.FACT.ntoken == 50


def test_setup_cfg_expname_and_logdir(tmp_path):
    f = tmp_path / "gtea.yaml"
    f.write_text("dataset: gtea\nFACT:\n  ntoken: 60\n")
    cfg = setup_cfg([str(f)], ["FACT.ntoken", "75", "aux.runid", "2"])
    # expname = yaml stem + diff-vs-(default+yaml)
    assert cfg.aux.exp.startswith("gtea")
    assert "Ntoken:75" in cfg.aux.exp or "ntoken:75" in cfg.aux.exp.lower()
    assert cfg.aux.logdir == os.path.join("log", "gtea", "split1", cfg.aux.exp, "2").replace("-", "_")


def test_update_from_inheritance():
    cfg = get_cfg_defaults()
    cfg.Bi.a_dim = 128
    update_from(cfg.Bu, cfg.Bi, inplace=True)
    assert cfg.Bu.a_dim == 128
    assert cfg.Bu.hid_dim == 512
    # non-None values are kept
    assert cfg.Bu.f_layers == 5
    # sequential inheritance Bi -> Bu -> BU
    cfg.Bu.f_layers = 7
    update_from(cfg.BU, cfg.Bu, inplace=True)
    assert cfg.BU.f_layers == 5  # BU.f_layers default is 5, not None -> kept
    assert cfg.BU.a_dim == 128


def test_cfg2flatdict():
    cfg = get_cfg_defaults()
    flat = cfg2flatdict(cfg)
    assert flat["FACT.ntoken"] == 30
    assert flat["Bi.hid_dim"] == 512
    assert flat["dataset"] == "breakfast"


def test_diff_dict():
    default = get_cfg_defaults()
    cfg = default.clone()
    cfg.FACT.ntoken = 99
    cfg.lr = 0.5
    diff = generate_diff_dict(default, cfg)
    assert diff == {"FACT": {"ntoken": 99}, "lr": 0.5}


def test_load_cfg_from_string():
    node = CfgNode.load_cfg("a: 1\nb:\n  c: hello\n")
    assert node.a == 1
    assert node.b.c == "hello"


def test_base_overlay_recipes(tmp_path):
    """`_BASE_: other.yaml` merges the base recipe first, then the overlay
    (used by the TPU production overlays, e.g. havid_tpu.yaml)."""
    (tmp_path / "base.yaml").write_text("lr: 0.5\nFACT:\n  ntoken: 7\n")
    (tmp_path / "overlay.yaml").write_text(
        "_BASE_: base.yaml\nFACT:\n  ntoken: 9\nTPU:\n  compute_dtype: bfloat16\n"
    )
    from fact_clip_tpu.configs.utils import setup_cfg

    cfg = setup_cfg([str(tmp_path / "overlay.yaml")])
    assert cfg.lr == 0.5  # from the base
    assert cfg.FACT.ntoken == 9  # overlay wins
    assert cfg.TPU.compute_dtype == "bfloat16"
    assert "overlay" in cfg.aux.exp


def test_havid_tpu_overlay_inherits_flagship_recipe():
    import os

    from fact_clip_tpu.configs.utils import setup_cfg

    root = os.path.join(os.path.dirname(__file__), "..", "fact_clip_tpu", "configs")
    cfg = setup_cfg([os.path.join(root, "havid_tpu.yaml")])
    base = setup_cfg([os.path.join(root, "havid.yaml")])
    assert cfg.TPU.compute_dtype == "bfloat16" and cfg.TPU.matcher == "auction"
    # the model/loss recipe is untouched
    for key in ("FACT", "Bi", "Bu", "BU", "Loss", "TM"):
        assert cfg[key] == base[key], key
