"""CLI smoke for scripts/import_torch_checkpoint.py --dry-run.

Creates a real reference checkpoint (the live torch model's state_dict),
converts it, and dry-runs the converted tree end-to-end (structure check +
one jitted forward+decode).  This keeps the real-data parity harness staged:
when actual datasets/checkpoints appear, BASELINE.md configs #1-#5 can be
scored immediately (VERDICT r1 task 10).
"""

import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not available")
@pytest.mark.slow
def test_import_dry_run_cli(tmp_path):
    import types

    import torch

    import fact_clip_tpu.configs.node as node

    yacs = types.ModuleType("yacs")
    yacs_config = types.ModuleType("yacs.config")
    yacs_config.CfgNode = node.CfgNode
    yacs.config = yacs_config
    sys.modules.setdefault("yacs", yacs)
    sys.modules.setdefault("yacs.config", yacs_config)

    sys.path.insert(0, REF)
    try:
        from fact_clip.configs.default import get_cfg_defaults as ref_defaults
        from fact_clip.models.blocks import FACT as RefFACT
    finally:
        sys.path.remove(REF)

    D, C = 16, 5
    cfg = ref_defaults()
    cfg.FACT.block = "iu"
    cfg.FACT.ntoken = 8
    cfg.FACT.fpos = False
    cfg.Bi.hid_dim = 32
    cfg.Bi.a_dim = 16
    cfg.Bi.a_ffdim = 32
    cfg.Bi.a_layers = 1
    cfg.Bi.a_nhead = 4
    cfg.Bi.f = "m"
    cfg.Bi.f_dim = 24
    cfg.Bi.f_layers = 2
    cfg.Bi.f_ln = False
    cfg.Bi.f_ngp = 1
    cfg.Bu.f_layers = 2
    torch.manual_seed(0)
    net = RefFACT(cfg, D, C)
    ckpt = tmp_path / "ref.net"
    torch.save(net.state_dict(), str(ckpt))

    smoke_yaml = tmp_path / "cfg.yaml"
    smoke_yaml.write_text(
        """
FACT: {block: iu, ntoken: 8, fpos: false}
Bi: {hid_dim: 32, a_dim: 16, a_ffdim: 32, a_layers: 1, a_nhead: 4,
     f: m, f_dim: 24, f_layers: 2, f_ln: false, f_ngp: 1}
Bu: {f_layers: 2}
"""
    )
    out = tmp_path / "converted.net"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "import_torch_checkpoint.py"),
         "--cfg", str(smoke_yaml), "--ckpt", str(ckpt), "--out", str(out),
         "--dry-run", "--in-dim", str(D), "--n-classes", str(C)],
        capture_output=True, text=True, timeout=600, env=env, cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "Converted" in r.stdout
    assert "dry-run OK" in r.stdout
    assert out.exists()
