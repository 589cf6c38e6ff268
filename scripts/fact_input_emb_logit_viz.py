#!/usr/bin/env python3
"""Visualize last-block frame/action embeddings and logits of a trained run.

Functional equivalent of /root/reference/scripts/fact_input_emb_logit_viz.py:
loads the latest checkpoint from a run logdir, collects the last block's
frame features and action-token features over the test split, projects them
to 2D (PCA; UMAP when the optional package exists), and writes scatter plots
colored by class plus per-video logit/attention heatmaps.

Usage:
  python scripts/fact_input_emb_logit_viz.py --logdir log/gtea/split1/<exp>/0 \
      [--cfg extra.yaml ...] [--split test] [--cap 300] [--out viz_out]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fact_clip_tpu.platform import ensure_platform

ensure_platform()

import numpy as np


def pca_2d(x: np.ndarray) -> np.ndarray:
    x = x - x.mean(0, keepdims=True)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    return x @ vt[:2].T


def reduce_2d(x: np.ndarray) -> np.ndarray:
    try:
        import umap  # noqa: PLC0415 - optional

        return umap.UMAP(n_components=2).fit_transform(x)
    except Exception:  # noqa: BLE001
        return pca_2d(x)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--logdir", required=True, help="run logdir containing args.json + ckpts/")
    parser.add_argument("--cfg", dest="cfg_file", nargs="*", default=[])
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    parser.add_argument("--cap", type=int, default=300, help="max frames per class in the scatter")
    parser.add_argument("--out", default=None)
    parser.add_argument("--n_heatmaps", type=int, default=4)
    args = parser.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from fact_clip_tpu.configs.utils import setup_cfg
    from fact_clip_tpu.engine import checkpoint as ckpt_io
    from fact_clip_tpu.engine.setup import build_experiment

    # rebuild the run config: args.json (flat) -> --set list, then overrides
    flat = json.load(open(os.path.join(args.logdir, "args.json")))
    set_list = []
    skip = {"aux.cfg_file", "aux.set_cfgs", "aux.exp", "aux.logdir"}
    for k, v in flat.items():
        if k in skip or v is None or isinstance(v, (list, tuple)):
            continue
        set_list.extend([k, str(v)])
    cfg = setup_cfg(args.cfg_file, set_list + (args.set_cfgs or []))

    out_dir = args.out or os.path.join(args.logdir, "viz")
    os.makedirs(out_dir, exist_ok=True)

    exp = build_experiment(cfg)

    def it_of(f):
        return int(f.rsplit(".", 1)[0].split("-")[-1])

    ckpts = [f for f in os.listdir(os.path.join(args.logdir, "ckpts")) if f.startswith("network.iter-")]
    assert ckpts, f"no checkpoints under {args.logdir}/ckpts"
    latest = max(ckpts, key=it_of)
    params = ckpt_io.load_model(exp.params, os.path.join(args.logdir, "ckpts", latest))
    print(f"loaded {latest}")

    trans = bool(cfg.FACT.trans)
    vis, lab_v, act, heatmaps = [], [], [], []
    per_cls = {}
    for batch in exp.test_loader():
        saves, _ = exp.model.apply(
            {"params": params}, batch.feats, batch.mask, batch.lengths,
            batch.transcript if trans else None,
            batch.seg_mask if trans else None,
            train=False,
        )
        last = saves[-1]
        frame_feat = np.asarray(last["frame_clogit"])  # (B, T, C) logits as embedding proxy
        action_feat = np.asarray(last["action_feature"])
        a2f = np.asarray(last["a2f_attn"])
        for i in range(len(batch.vnames)):
            t = int(batch.lengths[i])
            labels = np.asarray(batch.labels[i, :t])
            for j in range(t):
                c = int(labels[j])
                if per_cls.get(c, 0) >= args.cap:
                    continue
                per_cls[c] = per_cls.get(c, 0) + 1
                vis.append(frame_feat[i, j])
                lab_v.append(c)
            act.append(action_feat[i])
            if len(heatmaps) < args.n_heatmaps:
                heatmaps.append((batch.vnames[i], frame_feat[i, :t], a2f[i, :t], labels))

    vis = np.stack(vis)
    lab_v = np.array(lab_v)
    emb2d = reduce_2d(vis)
    plt.figure(figsize=(8, 7))
    sc = plt.scatter(emb2d[:, 0], emb2d[:, 1], c=lab_v, s=4, cmap="tab20")
    plt.colorbar(sc, label="class")
    plt.title("last-block frame embeddings (2D projection)")
    plt.savefig(os.path.join(out_dir, "frame_embeddings.png"), dpi=150, bbox_inches="tight")
    plt.close()

    for vname, logit, attn, labels in heatmaps:
        fig, axes = plt.subplots(3, 1, figsize=(12, 8), sharex=True,
                                 gridspec_kw={"height_ratios": [4, 4, 1]})
        axes[0].imshow(logit.T, aspect="auto", interpolation="nearest")
        axes[0].set_ylabel("class logit")
        axes[1].imshow(attn.T, aspect="auto", interpolation="nearest")
        axes[1].set_ylabel("a2f attention")
        axes[2].imshow(labels[None, :], aspect="auto", interpolation="nearest", cmap="tab20")
        axes[2].set_ylabel("gt")
        axes[2].set_xlabel("frame")
        fig.suptitle(vname)
        fig.savefig(os.path.join(out_dir, f"{vname}_logits.png"), dpi=150, bbox_inches="tight")
        plt.close(fig)

    print(f"wrote {out_dir}: frame_embeddings.png + {len(heatmaps)} heatmaps")


if __name__ == "__main__":
    main()
