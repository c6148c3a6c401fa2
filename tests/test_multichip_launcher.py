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
        timeout=2400,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert res.returncode == 0, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr}"
    assert "dryrun_multichip(8) ok" in res.stdout
    # the tensor-parallel detector section runs FULL-DEPTH over all devices
    assert "tp_detector: dp=4 tp=2" in res.stdout
    assert "layers=6+6 queries=200" in res.stdout
    assert "sharded_weights=0" not in res.stdout
    # the object-parallel tracker section sharded all 8 slots
    assert "object_parallel: slots=8 frames=3" in res.stdout


def test_initialize_distributed_env_wiring(monkeypatch):
    """Env-contract parsing (P6): SLURM/torchrun-style vars map onto
    jax.distributed.initialize args; single-host returns False untouched."""
    from efficientsam3_tpu.parallel import initialize_distributed

    import jax

    calls = {}

    def fake_init(**kw):
        calls.update(kw)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    for v in ("COORDINATOR_ADDRESS", "MASTER_ADDR", "MASTER_PORT",
              "NUM_PROCESSES", "SLURM_NTASKS", "WORLD_SIZE",
              "PROCESS_ID", "SLURM_PROCID", "RANK",
              "SAM3_COLLECTIVE_OP_TIMEOUT_SEC"):
        monkeypatch.delenv(v, raising=False)

    # no env -> single host, no init call
    assert initialize_distributed() is False
    assert calls == {}

    # torchrun-style env
    monkeypatch.setenv("MASTER_ADDR", "10.0.0.1")
    monkeypatch.setenv("MASTER_PORT", "4321")
    monkeypatch.setenv("WORLD_SIZE", "4")
    monkeypatch.setenv("RANK", "2")
    monkeypatch.setenv("SAM3_COLLECTIVE_OP_TIMEOUT_SEC", "77")
    assert initialize_distributed() is True
    assert calls == {
        "coordinator_address": "10.0.0.1:4321",
        "num_processes": 4,
        "process_id": 2,
        "initialization_timeout": 77,
    }
