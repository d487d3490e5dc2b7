"""Liveness heartbeat for long-running train/eval subprocesses.

The round-3 quality run hung at iteration 0 for 5.5 hours with no signal
(VERDICT r3 weak #2): a loader worker died and the trainer blocked forever.
Loops call `beat(it)` once per iteration; when WALDO_HEARTBEAT_FILE is set,
the current iteration lands there atomically and a supervisor (e.g.
scripts/real_data_trend.py) can kill + retry a child whose heartbeat goes
stale. No-op (zero syscalls after the first check) when the env var is
unset, so production runs pay nothing.
"""
from __future__ import annotations

import os

_PATH = None
_CHECKED = False


def beat(it) -> None:
    global _PATH, _CHECKED
    if not _CHECKED:
        _PATH = os.environ.get("WALDO_HEARTBEAT_FILE") or None
        _CHECKED = True
    if _PATH is None:
        return
    try:
        tmp = _PATH + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(it))
        os.replace(tmp, _PATH)
    except OSError:
        pass
