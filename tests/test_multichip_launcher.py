"""Launch the multichip dryrun in a subprocess.

The 8-virtual-device flag slows every XLA:CPU compile ~16x on this sandbox,
so it must not leak into the main pytest process (see conftest.py); the
dryrun gets its own interpreter with its own env.
"""

import os
import subprocess
import sys


def test_dryrun_multichip_8():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    res = subprocess.run(
        [sys.executable, "__graft_entry__.py", "--dryrun", "8"],
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert res.returncode == 0, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr}"
    assert "dryrun_multichip(8) ok" in res.stdout
    # the tensor-parallel detector section must actually shard weights
    assert "tp_detector: dp=2 tp=2" in res.stdout
    assert "sharded_weights=0" not in res.stdout
