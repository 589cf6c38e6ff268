"""Experiment logging: wandb when available, JSONL + console otherwise.

Keeps the reference's metric namespaces (train-loss/*, train-metric/*,
test-metric-{all,unseen,seen}/*) so curves are comparable
(/root/reference/scripts/train.py:43-76,278-299).  Without wandb (absent
from this image), the same (step, metrics) stream is appended to
``<logdir>/metrics.jsonl`` — one JSON object per log call — so training
curves survive the run and stay machine-readable.
"""

from __future__ import annotations

import json
import os


class Logger:
    def __init__(self, cfg, flat_config: dict, logdir: str | None = None):
        self._run = None
        self._jsonl = None
        logdir = logdir or cfg.aux.logdir
        offline = cfg.aux.debug or cfg.aux.wandb_offline
        try:
            import wandb  # noqa: PLC0415

            self._run = wandb.init(
                project=cfg.aux.wandb_project,
                entity=cfg.aux.wandb_user or None,
                dir=logdir,
                group=cfg.aux.exp,
                resume="allow",
                config=flat_config,
                reinit=True,
                save_code=False,
                mode="offline" if offline else "online",
            )
        except Exception:
            self._run = None
        import jax  # noqa: PLC0415

        if self._run is None and logdir and jax.process_index() == 0:
            try:
                os.makedirs(logdir, exist_ok=True)
                self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
            except OSError:
                self._jsonl = None

    def log(self, metrics: dict, step: int) -> None:
        if self._run is not None:
            self._run.log(metrics, step=step)
        if self._jsonl is not None:
            rec = {"step": int(step)}
            for k, v in metrics.items():
                try:
                    rec[k] = float(v)
                except (TypeError, ValueError):
                    rec[k] = str(v)
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()

    def finish(self) -> None:
        if self._run is not None:
            self._run.finish()
        if self._jsonl is not None:
            self._jsonl.close()
            self._jsonl = None


def split_metric_namespace(metrics: dict) -> dict:
    """Route metrics into test-metric-{all,seen,unseen}/* namespaces."""
    out = {}
    for k, v in metrics.items():
        if "-seen" in k:
            out[f"test-metric-seen/{k.replace('-seen', '')}"] = v
        elif "-unseen" in k:
            out[f"test-metric-unseen/{k.replace('-unseen', '')}"] = v
        else:
            out[f"test-metric-all/{k}"] = v
    return out
