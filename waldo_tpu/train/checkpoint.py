"""Checkpoint save/restore via Orbax.

Mirrors the reference checkpoint contract (models/__init__.py:5-108):
per-network checkpoints under checkpoints/<signature>/ with numbered and
named ("latest", "best_vid", "best_img") slots, named slots replacing their
predecessors; restore by iter number or name. Orbax gives atomic writes and
sharded-array support for multi-host for free.
"""
from __future__ import annotations

import os
import re
import shutil
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, checkpoint_path: str):
        self.root = os.path.abspath(checkpoint_path)
        os.makedirs(self.root, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _slot(self, label: str, it, name: Optional[str]) -> str:
        tag = name if name is not None else str(it)
        return os.path.join(self.root, f"{label}_{tag}")

    def save(self, label: str, params: Any, it: int, name: Optional[str] = None):
        """Save one network's params; named slots overwrite (models/__init__.py:18-21)."""
        path = self._slot(label, it, name)
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, params)
        self._ckptr.wait_until_finished()
        if name is not None:
            # record which iter the named slot points to
            with open(path + ".iter", "w") as f:
                f.write(str(it))

    def restore(self, label: str, template: Any, which: str = "latest",
                load_path: Optional[str] = None) -> Any:
        root = os.path.abspath(load_path) if load_path else self.root
        path = os.path.join(root, f"{label}_{which}")
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        return self._ckptr.restore(path, template)

    def exists(self, label: str, which: str = "latest", load_path: Optional[str] = None):
        root = os.path.abspath(load_path) if load_path else self.root
        return os.path.exists(os.path.join(root, f"{label}_{which}"))

    def latest_iter(self, label: str) -> Optional[int]:
        p = os.path.join(self.root, f"{label}_latest.iter")
        if os.path.exists(p):
            return int(open(p).read().strip())
        its = [
            int(m.group(1))
            for f in os.listdir(self.root)
            for m in [re.fullmatch(rf"{label}_(\d+)", f)]
            if m
        ]
        return max(its) if its else None
