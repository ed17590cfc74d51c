"""Process-scoped scratch paths, reaped at interpreter exit.

The engine's side-effecting queries (streaming replay landing zones,
the reference-surface store rebuilds, the NB scored-frame scratch) key
their temp trees by pid so CONCURRENT consumers of one fixture never
race each other's rmtree/write sequences (round-8 advice). The pid key
means no other process will ever reuse a tree, so each process must
reap its own — otherwise long-lived CI hosts without tmp cleaning
accumulate one tree per run (round-9 review finding). ``atexit``
covers every normal interpreter exit; a SIGKILLed process leaves its
tree for the OS tmp reaper, which is the same guarantee the previous
shared-path scheme had.
"""

from __future__ import annotations

import atexit
import shutil

_REGISTERED: set[str] = set()


def reap_at_exit(path: str) -> str:
    """Register ``path`` for best-effort recursive removal at process
    exit (idempotent per path). Returns the path for call-chaining."""
    if path not in _REGISTERED:
        _REGISTERED.add(path)
        atexit.register(shutil.rmtree, path, True)  # ignore_errors
    return path
