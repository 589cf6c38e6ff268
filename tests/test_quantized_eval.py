"""End-to-end int8 quantized evaluation vs f32 on a trained model.

Trains the smoke fixture model through the real train loop, then runs the
real eval step twice — the f32/bf16 path and the TPU.quantize_infer=int8
path (interpret-mode shims standing in for Mosaic on the CPU backend, the
exact math the TPU kernels execute) — and requires metric parity.  This is
the accuracy contract behind BASELINE.md's int8 section; the kernel-level
tolerances live in test_pallas_kernels.py and the hardware run in
scripts/verify_quant.py.
"""

import os
import unittest.mock as mock

import numpy as np
import pytest

# trains the fixture model e2e, then three interpret-mode evals per family
pytestmark = pytest.mark.slow

from fact_clip_tpu.engine import checkpoint as ckpt_io
from fact_clip_tpu.engine.setup import build_experiment
from fact_clip_tpu.engine.steps import make_step_fns
from fact_clip_tpu.engine.train_loop import run_train
from fact_clip_tpu.models import blocks as B
from fact_clip_tpu.ops.pallas import dilated_conv as dc
from fact_clip_tpu.ops.pallas import quant_conv as qc
from fact_clip_tpu.utils.results import Checkpoint, save_results

from test_train_smoke import fixture_base, smoke_cfg  # noqa: F401


def _interp(orig, act_scale=None):
    def f(*a, **kw):
        kw["interpret"] = True
        kw["tile"] = 32
        if act_scale is not None:
            kw["act_scale"] = act_scale
        return orig(*a, **kw)
    return f


def _eval_metrics(cfg, ckpt_file, quantize: str, act_scale: str = None):
    c = cfg.clone()
    c.TPU.quantize_infer = quantize
    exp = build_experiment(c)
    params = ckpt_io.load_model(exp.params, ckpt_file)
    _, eval_step = make_step_fns(exp.model, c, exp.dataset.nclasses,
                                 exp.cweight, exp.clip_bundle, verbnoun=exp.verbnoun)
    ck = Checkpoint(-1, bg_class=exp.test_dataset.bg_class)
    with mock.patch.object(B, "_PALLAS_PLATFORM_OVERRIDE", "tpu"), \
         mock.patch.object(qc, "dilated_residual_stack_q8",
                           _interp(qc.dilated_residual_stack_q8, act_scale)), \
         mock.patch.object(qc, "dilated_residual2_stack_q8",
                           _interp(qc.dilated_residual2_stack_q8, act_scale)), \
         mock.patch.object(dc, "dilated_residual_stack",
                           _interp(dc.dilated_residual_stack)), \
         mock.patch.object(dc, "dilated_residual2_stack",
                           _interp(dc.dilated_residual2_stack)):
        for batch in exp.test_loader():
            pred = np.asarray(eval_step(params, batch.device_arrays))
            saves = [{"pred": pred[i, : int(batch.lengths[i])]}
                     for i in range(len(batch.vnames))]
            save_results(ck, batch.vnames, batch.eval_labels, saves)
    ck.compute_metrics()
    return ck.metrics


@pytest.mark.parametrize("fbranch", ["m", "m2"])
def test_quantized_eval_metric_parity(fixture_base, tmp_path, fbranch):  # noqa: F811
    cfg = smoke_cfg(fixture_base)
    cfg.Bi.f = fbranch
    cfg.epoch = 16
    cfg.aux.eval_every = 16
    run_train(cfg, base_dir=str(tmp_path))

    ckpt_dir = os.path.join(str(tmp_path), cfg.aux.logdir, "ckpts")
    ckpt = sorted(f for f in os.listdir(ckpt_dir) if f.startswith("network.iter-"))[-1]
    ckpt_file = os.path.join(ckpt_dir, ckpt)

    m_f32 = _eval_metrics(cfg, ckpt_file, "")
    # both activation-scale modes must track f32 on a TRAINED model: "tile"
    # (the default — one scale per 512-frame VMEM window) is where an
    # outlier-magnitude frame could degrade every row in its tile, which
    # the small-random-input kernel gates cannot see (ADVICE r4)
    for act_scale in ("tile", "row"):
        m_q8 = _eval_metrics(cfg, ckpt_file, "int8", act_scale)
        assert m_f32.keys() == m_q8.keys() and m_f32
        worst = max(abs(m_f32[k] - m_q8[k]) for k in m_f32)
        # the quantization error (~0.5% on activations) must not move frame
        # predictions on the near-separable fixture; allow one boundary frame
        assert worst <= 2.0, (act_scale, worst, m_f32, m_q8)
