"""Generic training driver: epochs, meters, checkpointing, resume.

Mirrors the reference Trainer's responsibilities
(sam3/sam3/train/trainer.py:145: epochs, AMP, grad accumulation, meters,
checkpoint save/load with skip patterns, preemption resume) in functional
JAX form: the caller provides a jitted `train_step(variables, opt_state,
batch) -> (variables, opt_state, metrics)` and a batch iterator; the driver
owns the loop, logging, throughput meters, periodic + partial checkpoints,
and auto-resume from the latest saved step.

Data parallelism: pass a mesh and the driver shards each batch over 'dp'
and replicates state (XLA inserts gradient psums inside the step).
Gradient accumulation composes through optax.MultiSteps on the caller's tx.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Iterable, Optional

import numpy as np

import jax

from efficientsam3_tpu.utils.checkpoint import (
    latest_step,
    load_checkpoint,
    save_checkpoint,
)
from efficientsam3_tpu.utils.observability import LOG, MeterBank


@dataclasses.dataclass
class TrainerConfig:
    max_steps: int
    log_every: int = 50
    checkpoint_every: int = 1000
    checkpoint_dir: Optional[str] = None
    save_param_prefixes: Optional[tuple] = None  # partial checkpoints
    mesh: Optional[object] = None
    batch_axis: str = "dp"
    # metrics sink: JSONL + TensorBoard event files (reference
    # train/utils/logger.py TB/wandb Logger)
    log_dir: Optional[str] = None
    # graceful preemption: on SIGTERM/SIGUSR1 (SLURM requeue signals,
    # reference SubmititRunner checkpoint()/requeue), finish the current
    # step, checkpoint, and stop cleanly; auto-resume picks it back up.
    handle_preemption_signals: bool = True


class Trainer:
    def __init__(
        self,
        train_step: Callable,
        cfg: TrainerConfig,
        eval_fn: Optional[Callable] = None,
    ):
        self.train_step = train_step
        self.cfg = cfg
        self.eval_fn = eval_fn
        self.meters = MeterBank()
        self.preempted = False
        if cfg.handle_preemption_signals:
            self._install_signal_handlers()
        self.writer = None
        if cfg.log_dir is not None and jax.process_index() == 0:
            from efficientsam3_tpu.utils.observability import MetricsWriter

            self.writer = MetricsWriter(cfg.log_dir)

    def _install_signal_handlers(self):
        """SIGTERM/SIGUSR1 -> set the preemption flag; run() exits the loop
        after the in-flight step and writes a checkpoint so the requeued job
        resumes exactly where it stopped (reference SubmititRunner
        checkpoint + trainer.py preemption resume). Only installable from
        the main thread; silently skipped elsewhere (e.g. under pytest-run
        worker threads)."""
        import signal
        import threading

        if threading.current_thread() is not threading.main_thread():
            return

        def _flag(signum, frame):
            LOG.info("preemption signal %d: will checkpoint and stop", signum)
            self.preempted = True

        for sig in (signal.SIGTERM, signal.SIGUSR1):
            try:
                signal.signal(sig, _flag)
            except (ValueError, OSError):
                pass

    def _place(self, variables, opt_state, batch):
        if self.cfg.mesh is None:
            return variables, opt_state, batch
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(self.cfg.mesh, P())
        dp = NamedSharding(self.cfg.mesh, P(self.cfg.batch_axis))
        return (
            jax.device_put(variables, repl),
            jax.device_put(opt_state, repl),
            jax.tree.map(lambda x: jax.device_put(x, dp), batch),
        )

    def resume(self, variables, opt_state):
        """Auto-resume from the latest checkpoint (preemption recovery,
        reference trainer.py:227-239 / SubmititRunner requeue)."""
        if self.cfg.checkpoint_dir is None:
            return variables, opt_state, 0
        step = latest_step(self.cfg.checkpoint_dir)
        if step is None:
            return variables, opt_state, 0
        state, _ = load_checkpoint(
            self.cfg.checkpoint_dir, step,
            target={"variables": variables, "opt_state": opt_state},
        )
        LOG.info("resumed from step %d", step)
        return state["variables"], state["opt_state"], step

    def run(self, variables, opt_state, batches: Iterable[dict]):
        cfg = self.cfg

        def _save(step, variables, opt_state):
            state = {"variables": variables, "opt_state": opt_state}
            if cfg.save_param_prefixes is not None:
                # partial checkpoints (reference skip_saving_parameters)
                params = {
                    k: v
                    for k, v in variables["params"].items()
                    if any(k.startswith(p) for p in cfg.save_param_prefixes)
                }
                state = {"variables": dict(variables, params=params)}
            save_checkpoint(cfg.checkpoint_dir, step, state)

        variables, opt_state, start = self.resume(variables, opt_state)
        step = start
        t_last = time.perf_counter()
        for batch in batches:
            if step >= cfg.max_steps or self.preempted:
                break
            variables, opt_state, batch_p = self._place(variables, opt_state, batch)
            variables, opt_state, metrics = self.train_step(
                variables, opt_state, batch_p
            )
            step += 1
            if step % cfg.log_every == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                now = time.perf_counter()
                sps = cfg.log_every / (now - t_last)
                t_last = now
                self.meters.update(steps_per_s=sps, **metrics)
                self.meters.log(step, cfg.max_steps)
                if self.writer is not None:
                    self.writer.write(step, dict(metrics, steps_per_s=sps))
            if (
                cfg.checkpoint_dir is not None
                and step % cfg.checkpoint_every == 0
                and jax.process_index() == 0
            ):
                _save(step, variables, opt_state)
            if self.eval_fn is not None and step % cfg.checkpoint_every == 0:
                self.eval_fn(variables, step)
        if cfg.checkpoint_dir is not None and jax.process_index() == 0:
            _save(step, variables, opt_state)
        return variables, opt_state, step
