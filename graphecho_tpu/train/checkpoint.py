"""Checkpointing: full-TrainState orbax checkpoints with preemption safety.

The reference saves only the FPN weights, rank-0, via `torch.save` + an
`os.system('echo ...')` latest-pointer (`train_camus_echo.py:447-488`);
optimizer state, discriminators, GModule, TGCN, and the seed banks are lost on
restart. Here the WHOLE TrainState pytree (params of every component, opt
states, BN stats, seed banks, queues, rng, step) round-trips through one
orbax CheckpointManager — preemption-aware resume is exact.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from graphecho_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                               create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: TrainState, metrics: Optional[dict] = None):
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics)
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_like: TrainState, step: Optional[int] = None
                ) -> Optional[TrainState]:
        """Restore into the structure of `state_like` (an initialized state).
        Returns None if no checkpoint exists."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          state_like)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def close(self):
        self._mgr.close()
