#!/usr/bin/python3
"""Convert a reference PyTorch checkpoint (.net state_dict pickle) into this
framework's msgpack format.

Usage:
  python scripts/import_torch_checkpoint.py --cfg <yaml...> --ckpt ref.net \
      --out network.iter-0.net [--set k v ...]

The converted file can then be evaluated with scripts/run_eval.py; forward
and loss parity with the reference is covered by tests/test_torch_parity.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fact_clip_tpu.platform import ensure_platform

ensure_platform()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", dest="cfg_file", nargs="*", default=[])
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    parser.add_argument("--ckpt", required=True, help="reference torch state_dict file")
    parser.add_argument("--out", required=True, help="output msgpack checkpoint path")
    args = parser.parse_args()

    import torch

    from fact_clip_tpu.configs.utils import setup_cfg
    from fact_clip_tpu.engine.checkpoint import save_params
    from fact_clip_tpu.models.blocks import resolve_block_cfgs
    from fact_clip_tpu.utils.torch_import import convert_fact_state_dict

    cfg = setup_cfg(args.cfg_file, args.set_cfgs)
    bcfgs = resolve_block_cfgs(cfg)

    sd = torch.load(args.ckpt, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    params = convert_fact_state_dict(sd, bcfgs, trans=cfg.FACT.trans)

    save_params(params, args.out)
    print(f"Converted {len(sd)} tensors -> {args.out}")


if __name__ == "__main__":
    main()
