"""Orbax-backed checkpointing with keep-N rotation and resume.

Capability parity with the reference CheckpointManager
(reference: manager.py:12-49, checkpoint.py:7-35): save
{params, batch_stats, opt_state, step, epoch}, keep the newest N, resume all
of it. Improvements over the reference: rotation state is derived from disk
(the reference keeps it in memory and leaks old files across restarts,
manager.py:33-49), saves are sharding-aware (TP/DP-sharded arrays restore onto
any topology — the reference needed manual 'module.' prefix munging to move
between 1 and N GPUs), and writes are async so training does not stall.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from conformer_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self.directory = directory
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep, create=True, enable_async_checkpointing=True)
        self._mgr = ocp.CheckpointManager(directory, options=options)

    def save(self, state: TrainState, epoch: int = 0, force: bool = False) -> None:
        step = int(jax.device_get(state.step))
        payload = {"state": state, "meta": {"epoch": epoch}}
        self._mgr.save(step, args=ocp.args.Composite(
            state=ocp.args.StandardSave(payload["state"]),
            meta=ocp.args.JsonSave(payload["meta"]),
        ), force=force)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, abstract_state: TrainState,
                step: Optional[int] = None) -> Tuple[TrainState, int]:
        """-> (state, epoch). `abstract_state` supplies structure/shardings
        (e.g. from jax.eval_shape + shardings)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        restored = self._mgr.restore(step, args=ocp.args.Composite(
            state=ocp.args.StandardRestore(abstract_state),
            meta=ocp.args.JsonRestore(),
        ))
        meta = restored["meta"] or {}
        return restored["state"], int(meta.get("epoch", 0))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
