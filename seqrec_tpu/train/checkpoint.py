"""Checkpoint/resume (aux, SURVEY.md §5.4): orbax async, sharding-aware.

Covers the reference's `tf.train.Saver` role. Saves the full TrainState plus
data-pipeline position (batches consumed) so `--resume` restores exactly;
keeps the last K checkpoints.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3, async_save: bool = True):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(self._dir, options=options)

    def save(
        self,
        step: int,
        state: Any,
        data_position: int,
        data_state: Optional[dict] = None,
    ) -> None:
        """`data_state` is an optional JSON-serializable pipeline snapshot
        for streams whose position is not a pure batch count (the
        session-parallel SessionStream lane cursors, SURVEY.md §5.4)."""
        meta = {"data_position": int(data_position)}
        if data_state is not None:
            meta["data_state"] = data_state
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave(meta),
            ),
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self, abstract_state: Any
    ) -> Tuple[Any, int, int, Optional[dict]]:
        """Returns (state, step, data_position, data_state)."""
        step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self._dir}")
        out = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract_state),
                meta=ocp.args.JsonRestore(),
            ),
        )
        meta = out["meta"]
        return (
            out["state"],
            step,
            int(meta["data_position"]),
            meta.get("data_state"),
        )

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def abstract_like(state: Any) -> Any:
    """Abstract pytree (shape/dtype/sharding) for restore targets."""
    return jax.tree.map(ocp.utils.to_shape_dtype_struct, state)
