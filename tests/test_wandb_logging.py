"""The wandb branch of engine/logging.py, exercised via an injected stub.

wandb is absent from the image (as from the reference's minimal installs), so
CI covers the online-logging path with a fake module: Logger must call
``wandb.init`` with the reference's run arguments
(/root/reference/scripts/train.py:126-133), route ``log(metrics, step=...)``
through ``run.log`` with the reference's namespaces/step keys (train.py:278-299),
and close via ``run.finish``.  The JSONL fallback must stay off while a wandb
run is live.
"""

import sys
import types

import pytest

from fact_clip_tpu.configs.default import get_cfg_defaults
from fact_clip_tpu.configs.utils import cfg2flatdict
from fact_clip_tpu.engine.logging import Logger, split_metric_namespace


class _FakeRun:
    def __init__(self):
        self.logged = []
        self.finished = False

    def log(self, metrics, step=None):
        self.logged.append((dict(metrics), step))

    def finish(self):
        self.finished = True


@pytest.fixture()
def fake_wandb(monkeypatch):
    mod = types.ModuleType("wandb")
    mod.init_calls = []
    mod.run = _FakeRun()

    def init(**kwargs):
        mod.init_calls.append(kwargs)
        return mod.run

    mod.init = init
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod


def _cfg(tmp_path, **aux):
    cfg = get_cfg_defaults()
    cfg.aux.logdir = str(tmp_path / "log")
    cfg.aux.exp = "exp-group"
    cfg.aux.wandb_project = "proj"
    cfg.aux.wandb_user = "user"
    for k, v in aux.items():
        setattr(cfg.aux, k, v)
    return cfg


def test_wandb_init_arguments_match_reference(tmp_path, fake_wandb):
    cfg = _cfg(tmp_path)
    flat = cfg2flatdict(cfg)
    logger = Logger(cfg, flat)

    (call,) = fake_wandb.init_calls
    # the reference run's identity arguments (train.py:126-133)
    assert call["project"] == "proj"
    assert call["entity"] == "user"
    assert call["group"] == "exp-group"
    assert call["resume"] == "allow"
    assert call["config"] == flat
    assert call["mode"] == "online"
    assert call["reinit"] is True and call["save_code"] is False
    # a live wandb run supersedes the JSONL fallback
    assert logger._jsonl is None
    logger.finish()
    assert fake_wandb.run.finished


@pytest.mark.parametrize("aux", [dict(debug=True), dict(wandb_offline=True)])
def test_wandb_offline_modes(tmp_path, fake_wandb, aux):
    Logger(_cfg(tmp_path, **aux), {})
    (call,) = fake_wandb.init_calls
    assert call["mode"] == "offline"


def test_wandb_log_stream_namespaces_and_steps(tmp_path, fake_wandb):
    """The metric stream reaching run.log uses the reference's namespaces
    (train-loss/*, train-metric/*, test-metric-{all,seen,unseen}/*) and
    1-based global-step keys."""
    cfg = _cfg(tmp_path)
    logger = Logger(cfg, {})

    # train-side dict exactly as train_loop.py builds it (train.py:278-299)
    log_dict = {}
    for k, v in {"loss": 3.0, "atk_loss": 1.0}.items():
        log_dict[f"train-loss/{k}"] = v
    for k, v in {"F1@0.50": 0.5, "mof": 0.7}.items():
        log_dict["train-metric/" + k] = v
    logger.log(log_dict, step=100)

    # eval-side: holdout-split metrics route into the three namespaces
    test_dict = split_metric_namespace(
        {"mof": 0.6, "mof-seen": 0.7, "mof-unseen": 0.4}
    )
    logger.log(test_dict, step=100)
    logger.finish()

    (train_m, train_step), (test_m, test_step) = fake_wandb.run.logged
    assert train_step == 100 and test_step == 100
    assert set(train_m) == {
        "train-loss/loss", "train-loss/atk_loss",
        "train-metric/F1@0.50", "train-metric/mof",
    }
    assert set(test_m) == {
        "test-metric-all/mof", "test-metric-seen/mof", "test-metric-unseen/mof",
    }
    assert test_m["test-metric-unseen/mof"] == 0.4


def test_wandb_init_failure_falls_back_to_jsonl(tmp_path, monkeypatch):
    mod = types.ModuleType("wandb")

    def init(**kwargs):
        raise RuntimeError("no network")

    mod.init = init
    monkeypatch.setitem(sys.modules, "wandb", mod)
    cfg = _cfg(tmp_path)
    logger = Logger(cfg, {})
    assert logger._run is None and logger._jsonl is not None
    logger.log({"train-loss/loss": 1.0}, step=1)
    logger.finish()
    assert (tmp_path / "log" / "metrics.jsonl").exists()
