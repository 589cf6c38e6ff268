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
    parser.add_argument("--dry-run", action="store_true",
                        help="after converting, build the model from the config, "
                        "verify the tree matches a fresh init (structure+shapes), "
                        "and run one jitted forward+decode on synthetic data")
    parser.add_argument("--in-dim", type=int, default=2048,
                        help="feature dim for --dry-run (e.g. 2048 I3D, 1024 epic)")
    parser.add_argument("--n-classes", type=int, default=0,
                        help="class count for --dry-run; 0 -> infer from checkpoint")
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

    if args.dry_run:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from fact_clip_tpu.models import decode
        from fact_clip_tpu.models.blocks import build_fact

        n_classes = args.n_classes
        if n_classes <= 0:
            raise SystemExit("--dry-run requires --n-classes (dataset class count)")
        model = build_fact(cfg, args.in_dim, n_classes, s_pred_cap=128)

        rng = np.random.default_rng(0)
        B, T = 2, 256
        feats = jnp.asarray(rng.normal(size=(B, T, args.in_dim)).astype(np.float32))
        mask = jnp.ones((B, T), bool)
        lengths = jnp.full((B,), T, jnp.int32)

        fresh = model.init({"params": jax.random.PRNGKey(0)}, feats, mask, lengths, train=False)[
            "params"
        ]
        # structural validation: same tree, same shapes
        ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, fresh)
        got_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
        if ref_shapes != got_shapes:
            import difflib

            a = str(ref_shapes).split(",")
            b = str(got_shapes).split(",")
            diff = "\n".join(difflib.unified_diff(a, b, lineterm=""))[:4000]
            raise SystemExit(f"converted tree does not match the model tree:\n{diff}")

        @jax.jit
        def fwd(p):
            saves, _ = model.apply({"params": p}, feats, mask, lengths, train=False)
            last = saves[-1]
            token_mask = jnp.ones(last["action_clogit"].shape[:2], bool)
            return decode.decode_two_branch(
                last["action_clogit"], last["a2f_attn"], last["frame_clogit"],
                float(cfg.FACT.mwt), token_mask,
            )

        pred = np.asarray(fwd(params))
        print(f"dry-run OK: forward+decode on ({B}, {T}, {args.in_dim}); "
              f"pred classes used: {sorted(set(pred.ravel().tolist()))[:10]}...")


if __name__ == "__main__":
    main()
