"""Experiment logging: wandb when available, console otherwise.

Keeps the reference's metric namespaces (train-loss/*, train-metric/*,
test-metric-{all,seen,unseen}/*) so curves are comparable
(/root/reference/scripts/train.py:43-76,278-299).
"""

from __future__ import annotations


class Logger:
    def __init__(self, cfg, flat_config: dict):
        self._run = None
        offline = cfg.aux.debug or cfg.aux.wandb_offline
        try:
            import wandb  # noqa: PLC0415

            self._run = wandb.init(
                project=cfg.aux.wandb_project,
                entity=cfg.aux.wandb_user or None,
                dir=cfg.aux.logdir,
                group=cfg.aux.exp,
                resume="allow",
                config=flat_config,
                reinit=True,
                save_code=False,
                mode="offline" if offline else "online",
            )
        except Exception:
            self._run = None

    def log(self, metrics: dict, step: int) -> None:
        if self._run is not None:
            self._run.log(metrics, step=step)

    def finish(self) -> None:
        if self._run is not None:
            self._run.finish()


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
