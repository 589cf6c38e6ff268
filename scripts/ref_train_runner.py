#!/usr/bin/python3
"""Launch the REFERENCE implementation's real training CLI on this host.

Used by the learning-dynamics parity harness (tests/test_learning_dynamics.py,
BASELINE.md): trains the reference stack from scratch through its own
``scripts/train.py`` on a fixture dataset, so its loss trajectory and final
metrics can be compared against this framework trained on the same data.

The reference code is *executed*, never copied; this launcher only provides
the environment its CLI assumes but this container lacks:
  * ``wandb``          -> stub module (not installed here; the reference logs
                          metrics through it but all comparisons parse stdout)
  * CUDA               -> ``Tensor.cuda``/``Module.cuda`` become identity
                          (torch is CPU-only here; train.py:261-262 calls
                          .cuda() unconditionally)
  * project BASE dir   -> ``fact_clip.home.get_project_base`` is pointed at a
                          writable scratch root that holds ``data/<name>/``
                          and receives ``log/`` (the reference resolves both
                          relative to its own checkout, which is read-only)

Usage:
  python scripts/ref_train_runner.py --base <scratch_root> --seed 1 \
      -- --cfg cfg.yaml --set key value ...
Everything after ``--`` is passed to the reference CLI verbatim.
"""

import argparse
import importlib.machinery
import os
import runpy
import sys
import types

REF = "/root/reference"


def _stub_module(name: str) -> types.ModuleType:
    """A stub that also satisfies importlib.util.find_spec probes
    (transformers/accelerate check wandb availability that way)."""
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return mod


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--base", required=True,
                        help="scratch root containing data/<name>/; log/ is written here")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("ref_args", nargs=argparse.REMAINDER,
                        help="arguments for the reference train.py (after --)")
    args = parser.parse_args()
    ref_args = args.ref_args
    if ref_args and ref_args[0] == "--":
        ref_args = ref_args[1:]

    base = os.path.abspath(args.base) + "/"

    # --- yacs shim (the reference imports yacs; this container has none.
    # Our config node is schema-compatible by design.)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import fact_clip_tpu.configs.node as node

    yacs = _stub_module("yacs")
    yacs_config = _stub_module("yacs.config")
    yacs_config.CfgNode = node.CfgNode
    yacs.config = yacs_config
    sys.modules["yacs"] = yacs
    sys.modules["yacs.config"] = yacs_config

    # --- wandb stub
    class _Run:
        def log(self, *a, **k):
            pass

        def finish(self):
            pass

    wandb = _stub_module("wandb")
    wandb.init = lambda *a, **k: _Run()
    sys.modules["wandb"] = wandb

    # --- CPU-only torch: .cuda() as identity
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    # torch.load calls that name a CUDA map_location (the reference's
    # text-embedding cache loader passes device='cuda:<gpu>',
    # utils/text_embeddings.py:144) must land on CPU here
    _torch_load = torch.load

    def _cpu_load(*a, **k):
        k["map_location"] = "cpu"
        return _torch_load(*a, **k)

    torch.load = _cpu_load

    # --- deterministic run (train.py only seeds in debug mode, but debug
    # mode swaps the train set for the test set; seed here instead)
    import numpy as np

    np.random.seed(args.seed)
    torch.manual_seed(args.seed)

    # --- point the reference's project BASE at the scratch root
    sys.path.insert(0, REF)
    import fact_clip.home as home

    home.get_project_base = lambda: base

    sys.argv = ["train.py"] + list(ref_args)
    runpy.run_path(os.path.join(REF, "scripts", "train.py"), run_name="__main__")


if __name__ == "__main__":
    main()
