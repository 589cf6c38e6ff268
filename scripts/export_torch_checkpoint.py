#!/usr/bin/python3
"""Export a TPU-trained flax checkpoint to a reference-loadable torch .net.

Usage:
  python scripts/export_torch_checkpoint.py --cfg <yaml...> --ckpt network.iter-N.net \
      --in-dim 2048 --n-classes 75 --out ref_weights.net [--set k v ...]

The output is a ``torch.save``d state_dict that the reference loads with its
own protocol (/root/reference/scripts/run_eval.py:134-137:
``torch.load`` + delete ``*_pe.pe`` + ``load_state_dict(strict=False)``),
enabling cross-validation of TPU-trained weights under the reference
implementation.  Round-trip and reference-forward parity are covered by
tests/test_torch_export.py.
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
    parser.add_argument("--ckpt", required=True, help="flax msgpack/orbax checkpoint")
    parser.add_argument("--out", required=True, help="output torch state_dict path")
    parser.add_argument("--in-dim", type=int, required=True, help="feature dim (e.g. 2048)")
    parser.add_argument("--n-classes", type=int, required=True, help="dataset class count")
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    from fact_clip_tpu.configs.utils import setup_cfg
    from fact_clip_tpu.engine.checkpoint import load_model
    from fact_clip_tpu.models.blocks import build_fact, resolve_block_cfgs
    from fact_clip_tpu.utils.torch_export import export_fact_state_dict

    cfg = setup_cfg(args.cfg_file, args.set_cfgs)
    bcfgs = resolve_block_cfgs(cfg)

    model = build_fact(cfg, args.in_dim, args.n_classes, s_pred_cap=128)
    feats = jnp.zeros((1, 64, args.in_dim), jnp.float32)
    mask = jnp.ones((1, 64), bool)
    lengths = jnp.full((1,), 64, jnp.int32)
    template = model.init({"params": jax.random.PRNGKey(0)},
                          feats, mask, lengths, train=False)

    variables = load_model(template, args.ckpt)
    params = variables["params"] if "params" in variables else variables

    sd = export_fact_state_dict(params, bcfgs, trans=cfg.FACT.trans)
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, args.out)
    print(f"Exported {len(sd)} tensors -> {args.out}")


if __name__ == "__main__":
    main()
