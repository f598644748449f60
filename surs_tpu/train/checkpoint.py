"""Orbax checkpointing.

Reference behavior: flat ``torch.save(state_dict)`` to
``{checkpoints_path}/{name}/netG_latest`` and ``netG_epoch_{N}`` every
``freq_save`` iterations and at each epoch end (apps/train_SuRS.py:162-164,
189); optimizer state is NOT saved there. Here the full train state
(params + optimizer state + step/epoch) is checkpointed so resume is
exact, with the same directory naming convention.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, checkpoints_path: str, name: str):
        self.root = os.path.abspath(os.path.join(checkpoints_path, name))
        os.makedirs(self.root, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, tag: str) -> str:
        return os.path.join(self.root, tag)

    def save(self, state: Any, epoch: int, latest: bool = True) -> None:
        self._ckptr.save(self._path(f"netG_epoch_{epoch}"), state,
                         force=True)
        if latest:
            self._ckptr.save(self._path("netG_latest"), state, force=True)
        self._ckptr.wait_until_finished()

    def restore(self, target: Any, epoch: Optional[int] = None) -> Any:
        """Restore into the structure of ``target`` (a concrete or
        abstract train state). epoch=None -> netG_latest (the reference's
        resume_epoch < 0 convention, apps/train_SuRS.py:88-91)."""
        tag = "netG_latest" if epoch is None else f"netG_epoch_{epoch}"
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        return self._ckptr.restore(self._path(tag), abstract)

    def exists(self, epoch: Optional[int] = None) -> bool:
        tag = "netG_latest" if epoch is None else f"netG_epoch_{epoch}"
        return os.path.isdir(self._path(tag))
