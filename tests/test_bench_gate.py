"""The bench TPU-relay gate: stale fallback only on hangs, not on breakage.

bench.py probes ``jax.devices()`` in a subprocess before measuring.  Two
failure modes must be told apart:

- the probe HANGS (TimeoutExpired): the axon relay is down — emit the last
  on-hardware result marked ``"stale": true`` so the driver artifact stays
  informative (exit 0);
- the probe exits nonzero FAST: a code/env regression — exit 1 so the
  regression is not masked behind a successful-looking stale emit.

These paths only execute during outages, so they get unit coverage here.
"""

import json
import subprocess

import pytest


@pytest.fixture()
def bench(monkeypatch, tmp_path):
    import bench as bench_mod

    # no real sleeping between probe attempts
    monkeypatch.setattr(bench_mod.time, "sleep", lambda s: None)
    monkeypatch.setattr(bench_mod, "LAST_GOOD", str(tmp_path / "last_good.json"))
    return bench_mod


def _probe_result(returncode):
    class R:
        pass

    r = R()
    r.returncode = returncode
    r.stderr = b"boom"
    return r


def test_probe_success_returns(bench, monkeypatch):
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _probe_result(0))
    bench._wait_for_tpu(max_wait_s=0.01, probe_timeout_s=0.01)  # no exit


def test_fast_probe_failure_exits_nonzero(bench, monkeypatch, capsys):
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: _probe_result(1))
    with pytest.raises(SystemExit) as e:
        bench._wait_for_tpu(max_wait_s=0.01, probe_timeout_s=0.01)
    assert e.value.code == 1
    assert capsys.readouterr().out == ""  # nothing emitted for the driver


def test_timeout_emits_stale_last_good(bench, monkeypatch, capsys):
    last = {"metric": "frames_per_sec_per_chip", "value": 123.0}
    with open(bench.LAST_GOOD, "w") as f:
        json.dump(last, f)

    def hang(*a, **k):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=k.get("timeout", 1))

    monkeypatch.setattr(subprocess, "run", hang)
    with pytest.raises(SystemExit) as e:
        bench._wait_for_tpu(max_wait_s=0.01, probe_timeout_s=0.01)
    assert e.value.code == 0
    out = json.loads(capsys.readouterr().out)
    assert out["stale"] is True and out["value"] == 123.0


def test_timeout_without_last_good_exits_nonzero(bench, monkeypatch, capsys):
    def hang(*a, **k):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=k.get("timeout", 1))

    monkeypatch.setattr(subprocess, "run", hang)
    with pytest.raises(SystemExit) as e:
        bench._wait_for_tpu(max_wait_s=0.01, probe_timeout_s=0.01)
    assert e.value.code == 1
    assert capsys.readouterr().out == ""


def test_median_iqr():
    med, iqr = bench_stats([1.0, 2.0, 3.0, 4.0, 100.0])
    assert med == 3.0  # robust to the outlier sample
    assert iqr == pytest.approx(2.0)


def bench_stats(samples):
    import bench as bench_mod

    return bench_mod._median_iqr(samples)


def test_last_good_gated_on_median_not_worse(bench):
    good = {"metric": "frames_per_sec_per_chip", "value": 1000.0}
    with open(bench.LAST_GOOD, "w") as f:
        json.dump(good, f)

    # a >10%-worse median must NOT overwrite the cache
    bench._update_last_good({"metric": "frames_per_sec_per_chip", "value": 800.0})
    with open(bench.LAST_GOOD) as f:
        assert json.load(f)["value"] == 1000.0

    # within-noise (or better) medians refresh it
    bench._update_last_good({"metric": "frames_per_sec_per_chip", "value": 950.0})
    with open(bench.LAST_GOOD) as f:
        assert json.load(f)["value"] == 950.0


def test_last_good_accepts_reproduced_regression(bench):
    good = {"metric": "frames_per_sec_per_chip", "value": 1000.0}
    with open(bench.LAST_GOOD, "w") as f:
        json.dump(good, f)

    # first regressed run: refused, parked
    bench._update_last_good({"metric": "frames_per_sec_per_chip", "value": 780.0})
    with open(bench.LAST_GOOD) as f:
        assert json.load(f)["value"] == 1000.0

    # second run agreeing with the parked one: the regression is real
    bench._update_last_good({"metric": "frames_per_sec_per_chip", "value": 790.0})
    with open(bench.LAST_GOOD) as f:
        assert json.load(f)["value"] == 790.0
    import os

    assert not os.path.exists(bench.LAST_GOOD + ".refused")


def test_last_good_nonreproducing_regression_stays_refused(bench):
    good = {"metric": "frames_per_sec_per_chip", "value": 1000.0}
    with open(bench.LAST_GOOD, "w") as f:
        json.dump(good, f)

    # two regressed runs that disagree with each other (>10% apart):
    # noise, not a persistent regression — keep the good cache
    bench._update_last_good({"metric": "frames_per_sec_per_chip", "value": 600.0})
    bench._update_last_good({"metric": "frames_per_sec_per_chip", "value": 800.0})
    with open(bench.LAST_GOOD) as f:
        assert json.load(f)["value"] == 1000.0


def test_last_good_gates_bf16_headline(bench):
    good = {"metric": "frames_per_sec_per_chip", "value": 1000.0,
            "bf16_frames_per_sec_per_chip": 5000.0}
    with open(bench.LAST_GOOD, "w") as f:
        json.dump(good, f)

    # f32 fine but the bf16 serving headline regressed >10%: refuse
    bench._update_last_good({"metric": "frames_per_sec_per_chip", "value": 1000.0,
                             "bf16_frames_per_sec_per_chip": 4000.0})
    with open(bench.LAST_GOOD) as f:
        assert json.load(f)["bf16_frames_per_sec_per_chip"] == 5000.0


def test_last_good_stale_entry_always_replaced(bench):
    stale = {"metric": "frames_per_sec_per_chip", "value": 5000.0, "stale": True}
    with open(bench.LAST_GOOD, "w") as f:
        json.dump(stale, f)
    # a stale marker is not a measurement — any fresh number replaces it
    bench._update_last_good({"metric": "frames_per_sec_per_chip", "value": 800.0})
    with open(bench.LAST_GOOD) as f:
        out = json.load(f)
    assert out["value"] == 800.0 and "stale" not in out
