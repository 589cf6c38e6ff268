"""The hardware-verify driver must leave a truthful PARTIAL artifact when a
suite hangs or the process is killed mid-run (round 5: an external timeout
on the all-at-the-end writer lost ~1h of completed hardware checks)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_incremental_artifact_survives_midrun_kill(tmp_path):
    # two fake suites: the first passes instantly, the second hangs forever;
    # kill the driver while the second runs and inspect the artifact
    scripts_dir = tmp_path / "scripts"
    scripts_dir.mkdir()
    fast = scripts_dir / "verify_fast.py"
    fast.write_text("print('PASS fake-check  rel-err 1.0e-09')\n")
    hang = scripts_dir / "verify_hang.py"
    hang.write_text("import time\ntime.sleep(600)\n")
    out = tmp_path / "VERIFY.json"

    driver = tmp_path / "driver.py"
    driver.write_text(
        f"""
import sys
sys.path.insert(0, {os.path.join(REPO, 'scripts')!r})
sys.argv = ['verify_hardware.py', '--out', {str(out)!r}]
import verify_hardware as vh
vh.SUITES = ['{fast.name}', '{hang.name}']
vh.REPO = {str(tmp_path)!r}
vh.main()
"""
    )
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen([sys.executable, str(driver)], env=env,
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    # wait for the first suite's artifact flush, then kill mid-suite-2
    import time

    deadline = time.time() + 120
    while time.time() < deadline and not out.exists():
        time.sleep(0.5)
    assert out.exists(), "no incremental artifact appeared"
    proc.kill()
    proc.wait(timeout=30)

    art = json.load(open(out))
    assert art["suites"][0]["ok"] is True
    assert art["suites"][0]["checks"][0]["name"] == "fake-check"
    assert art["pending"] == [hang.name]
    assert art["ok"] is False  # incomplete run must not claim success
