"""Process-scoped scratch directories (tracked mkdtemp).

`tempfile.mkdtemp` creates under the GLOBAL /tmp and Python never
removes it, so per-invocation replay/object/checkpoint dirs leak for
the host's lifetime across bench min-of-2 runs and repeated sweeps
(ADVICE r13). Every scratch dir is registered here and removed at
process exit; within the process each invocation still gets a fresh,
private directory — no cross-run reuse of any materialized data.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_SCRATCH_DIRS: list[str] = []


def _cleanup() -> None:
    for d in _SCRATCH_DIRS:
        shutil.rmtree(d, ignore_errors=True)


atexit.register(_cleanup)


def scratch_dir(prefix: str) -> str:
    """mkdtemp + atexit removal: per-invocation scratch that cannot
    outlive the process."""
    d = tempfile.mkdtemp(prefix=prefix)
    _SCRATCH_DIRS.append(d)
    return d
