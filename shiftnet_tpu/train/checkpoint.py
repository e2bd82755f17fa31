"""Orbax checkpointing with reference-equivalent auto-resume.

Replaces the reference's two-file ``.pth``/``.state`` scheme
(``basicsr/models/base_model.py:193-328``): one orbax checkpoint per save
holding params + optimizer state + step.  Auto-resume scans the checkpoint
dir and restores the highest step (``train1.py:137-158``).  ``save_params_npz``
additionally exports weights as a torch-keyed ``.npz``, loadable by either
framework (replaces ``save_network``'s ``{'params': ...}`` pth for interop).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=False),
        )

    def save(self, step: int, state: Any) -> None:
        self.mngr.save(step, args=ocp.args.StandardSave(state))
        self.mngr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self.mngr.latest_step()

    def restore(self, state_template: Any, step: int | None = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        return self.mngr.restore(
            step, args=ocp.args.StandardRestore(state_template))


def save_params_npz(path: str, params: dict) -> None:
    """Export flax params as a torch-keyed npz (interop format)."""
    from shiftnet_tpu.tools.convert_torch import flax_to_torch_state
    state = flax_to_torch_state(jax.device_get(params))
    np.savez_compressed(path, **state)


def load_params_npz(path: str, params_template: dict) -> dict:
    from shiftnet_tpu.tools.convert_torch import torch_state_to_flax
    with np.load(path) as data:
        state = {k: data[k] for k in data.files}
    return torch_state_to_flax(state, params_template)
