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



def normalize_which(which):
    """Map None/"" to "latest"; keep everything else verbatim — `0` (and
    "0") are valid iteration names and must NOT fall through to latest."""
    return "latest" if which in (None, "") else str(which)


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

    def _resolve(self, label: str, which: str, root: str) -> str:
        path = os.path.join(root, f"{label}_{which}")
        if os.path.exists(path):
            return path
        # glob-by-iter fallback (reference models/__init__.py:94-102): a
        # missing named slot resolves to the highest numbered one
        its = [
            int(m.group(1))
            for f in os.listdir(root)
            for m in [re.fullmatch(rf"{re.escape(label)}_(\d+)", f)]
            if m
        ] if os.path.isdir(root) else []
        if which == "latest" and its:
            return os.path.join(root, f"{label}_{max(its)}")
        raise FileNotFoundError(path)

    def restore(self, label: str, template: Any, which: str = "latest",
                load_path: Optional[str] = None, strict: bool = False) -> Any:
        """Restore one network's params into `template`.

        strict=False (default) reproduces the reference's tolerant loader
        (models/__init__.py:27-45): saved leaves whose shape mismatches the
        template are PRUNED (template/init value kept, loudly reported), and
        template leaves absent from the checkpoint keep their init — so
        fine-tuning with a changed head works. strict=True is the orbax
        exact restore."""
        root = os.path.abspath(load_path) if load_path else self.root
        path = self._resolve(label, which, root)
        if strict:
            return self._ckptr.restore(path, template)
        try:
            return self._ckptr.restore(path, template)
        except Exception:
            pass  # shape/key mismatch: merge leaf-by-leaf below
        saved = ocp.PyTreeCheckpointer().restore(path)
        s_flat = {
            tuple(str(getattr(p, "key", getattr(p, "idx", p))) for p in kp): leaf
            for kp, leaf in jax.tree_util.tree_flatten_with_path(saved)[0]
        }

        pruned, missing = [], []

        def merge(kp, t_leaf):
            key = tuple(str(getattr(p, "key", getattr(p, "idx", p))) for p in kp)
            if key not in s_flat:
                missing.append(".".join(key))
                return t_leaf
            s_leaf = s_flat[key]
            if tuple(getattr(s_leaf, "shape", ())) != tuple(getattr(t_leaf, "shape", ())):
                pruned.append(
                    f"{'.'.join(key)} {getattr(s_leaf, 'shape', ())} -> "
                    f"{getattr(t_leaf, 'shape', ())}"
                )
                return t_leaf
            return jax.numpy.asarray(s_leaf, getattr(t_leaf, "dtype", None))

        out = jax.tree_util.tree_map_with_path(merge, template)
        if pruned or missing:
            print(
                f"[ckpt] non-strict restore of {label} from {path}: "
                f"pruned (shape mismatch): {pruned or 'none'}; "
                f"missing (kept init): {missing or 'none'}",
                flush=True,
            )
        return out

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
