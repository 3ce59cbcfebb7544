"""Checkpoint save/restore of {params, ema_params, opt_state, step}.

TPU-native counterpart of the reference's two mechanisms (SURVEY.md section 5):
the examples' plain ``torch.save`` dicts (examples/images/cifar10/
train_cifar10.py:157-166) and the runner's Lightning ModelCheckpoint
(runner/configs/callbacks/model_checkpoint.yaml). Uses orbax for
sharding-aware, multi-host-safe saves of the whole TrainState pytree — there
is no ``module.`` prefix to strip because parallelism never touches parameter
names (compute_fid.py:52-62's DataParallel workaround is structurally
impossible here).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from .train import TrainState


class CheckpointManager:
    """Thin orbax wrapper: save every N steps, keep the latest K, resume."""

    def __init__(self, directory: str, save_interval: int = 20000, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        self.save_interval = save_interval
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, state: TrainState, force: bool = False, step: Optional[int] = None) -> bool:
        """Save when due. Pass ``step`` (host-side counter) to avoid the
        device sync of reading state.step — on high-latency runtimes that
        read costs a full round-trip per call."""
        if step is None:
            step = int(state.step)
        if not force and (self.save_interval <= 0 or step % self.save_interval != 0):
            return False
        self._mgr.save(step, args=ocp.args.StandardSave(state._asdict()))
        self._mgr.wait_until_finished()
        return True

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_like: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore into the structure of ``state_like`` (shapes/shardings)."""
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_like._asdict())
        )
        return TrainState(**restored)

    def close(self):
        self._mgr.close()


def save_train_state(path: str, state: TrainState) -> None:
    """One-shot save (no manager bookkeeping)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state._asdict(), force=True)
    ckptr.wait_until_finished()


def restore_train_state(path: str, state_like: TrainState) -> TrainState:
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path), state_like._asdict())
    return TrainState(**restored)
