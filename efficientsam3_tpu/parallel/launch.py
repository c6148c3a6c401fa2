"""Multi-host launch entry (P6, reference train/train.py:61-310).

The reference launches one torch process per GPU via mp.spawn / submitit
and wires ranks through env vars. The JAX equivalent is one process per
HOST calling jax.distributed.initialize; devices on other hosts then appear
in jax.devices() and every pjit/shard_map collective rides ICI/DCN.

Env contract (same names SLURM/torchrun users expect):
  COORDINATOR_ADDRESS / MASTER_ADDR(+PORT)  coordinator "host:port"
  PROCESS_ID / SLURM_PROCID / RANK          this host's process index
  NUM_PROCESSES / SLURM_NTASKS / WORLD_SIZE process count
"""

from __future__ import annotations

import os
from typing import Optional


def _env(*names, default=None):
    for n in names:
        v = os.environ.get(n)
        if v is not None:
            return v
    return default


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize JAX multi-host from args or env. Returns True if a
    multi-process runtime was initialized (False for single-host runs).

    Safe to call unconditionally at the top of training scripts (the
    reference's setup_distributed_backend analog,
    train/utils/train_utils.py)."""
    import jax

    coord = coordinator_address or _env("COORDINATOR_ADDRESS")
    if coord is None:
        addr = _env("MASTER_ADDR")
        port = _env("MASTER_PORT", default="1234")
        if addr is not None:
            coord = f"{addr}:{port}"
    n = num_processes if num_processes is not None else _env(
        "NUM_PROCESSES", "SLURM_NTASKS", "WORLD_SIZE"
    )
    pid = process_id if process_id is not None else _env(
        "PROCESS_ID", "SLURM_PROCID", "RANK"
    )
    if coord is None or n is None or int(n) <= 1:
        return False
    # Bounded rendezvous: the reference bounds collectives with
    # SAM3_COLLECTIVE_OP_TIMEOUT_SEC (sam3_video_base.py:141-144) so a dead
    # peer fails fast instead of hanging the job; the JAX analog is the
    # coordinator init/heartbeat timeouts.
    timeout_s = int(_env("SAM3_COLLECTIVE_OP_TIMEOUT_SEC", default="300"))
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(n),
        process_id=int(pid or 0),
        initialization_timeout=timeout_s,
    )
    return True


def global_mesh(axis_sizes: dict[str, int]):
    """Mesh over ALL processes' devices (call after initialize_distributed).

    Axis order should put the inter-host axis first so data-parallel
    gradient reductions ride DCN while model axes stay on intra-host ICI
    (scaling-book recipe)."""
    from efficientsam3_tpu.parallel.sharding import make_mesh

    import jax

    return make_mesh(axis_sizes, devices=jax.devices())
