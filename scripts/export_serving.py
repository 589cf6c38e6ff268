#!/usr/bin/python3
"""Export a trained checkpoint as a self-contained AOT serving artifact.

``python scripts/export_serving.py --cfg <yaml...> --ckpt <file> --out <zip>
[--platforms tpu,cpu] [--batch-size N] [--buckets L1,L2] [--no-pallas]
[--set k v ...]``

The artifact bundles one serialized StableHLO program per padded-length
bucket (weights baked in) plus a JSON header; see
fact_clip_tpu/engine/export.py.  The default target is a Pallas-fused
tpu-only artifact, cross-compiled even when this process runs on CPU.  The
reference has no equivalent — its eval path re-instantiates the Python
model tree around a torch pickle (/root/reference/scripts/run_eval.py:134-137).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fact_clip_tpu.platform import ensure_platform

ensure_platform()

from fact_clip_tpu.configs.utils import setup_cfg
from fact_clip_tpu.engine import checkpoint as ckpt_io
from fact_clip_tpu.engine.export import export_serving, save_serving
from fact_clip_tpu.engine.setup import build_experiment
from fact_clip_tpu.home import get_project_base


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", dest="cfg_file", nargs="*", default=[])
    parser.add_argument("--ckpt", dest="ckpt_file", required=True)
    parser.add_argument("--out", dest="out_file", required=True)
    parser.add_argument("--platforms", default="tpu",
                        help="comma list; multi-platform artifacts disable Pallas")
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--buckets", default=None,
                        help="comma list of bucket lengths to export (default: all)")
    parser.add_argument("--no-pallas", action="store_true")
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    cfg = setup_cfg(args.cfg_file, args.set_cfgs)
    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())

    text_embeddings = None
    if cfg.use_clip:
        from scripts.train import resolve_text_embeddings  # noqa: PLC0415

        text_embeddings = resolve_text_embeddings(cfg, get_project_base())

    exp = build_experiment(cfg, text_embeddings=text_embeddings)
    print(f"Loading checkpoint: {args.ckpt_file}")
    params = ckpt_io.load_model(exp.params, args.ckpt_file)

    buckets = [int(b) for b in args.buckets.split(",")] if args.buckets else None
    pallas = False if args.no_pallas else None
    exported, meta = export_serving(
        exp, params, platforms=platforms, batch_size=args.batch_size,
        bucket_lengths=buckets, pallas=pallas,
    )
    save_serving(args.out_file, exported, meta)
    size = os.path.getsize(args.out_file)
    print(f"Wrote {args.out_file} ({size / 1e6:.1f} MB): "
          f"platforms={meta['platforms']} pallas={meta['pallas']} "
          f"B={meta['batch_size']} buckets={meta['buckets']}")


if __name__ == "__main__":
    main()
