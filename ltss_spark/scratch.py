"""Session-scoped scratch space for registry entries that land files.

Several registry entries exercise real write paths (sinks, compaction,
migrations, streaming ingest) and therefore must create directories and
catalog tables. Previously each call minted a fresh uuid dir under
``tempfile.gettempdir()`` that outlived the process — repeated
``check_parity`` runs accumulated /tmp litter (VERDICT r2 item 8).

Now every entry allocates under ONE per-process root that is removed at
interpreter exit (``atexit`` + ``shutil.rmtree``): uniqueness across
concurrent sessions comes from the root (``mkdtemp``), uniqueness across
calls within a session from the per-call uuid suffix, and cleanup is a
single tree removal. ``session_tag()`` gives entries that register catalog
tables a name component that is stable within the session (so repeated
calls OVERWRITE one table instead of accumulating uuid-tagged ones) yet
unique across processes.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

_ROOT: str | None = None


def _root() -> str:
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(prefix="ltss_scratch_")
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def scratch_dir(prefix: str) -> str:
    """A fresh, not-yet-created path under the session scratch root —
    unique per call (safe to re-run an entry), removed with the root at
    process exit."""
    return os.path.join(_root(), f"{prefix}_{uuid.uuid4().hex}")


def session_tag() -> str:
    """A name component stable for this process and unique across
    processes (derived from the scratch root) — for catalog table names,
    so an entry re-run replaces its own table rather than leaking a new
    uuid-tagged one per call."""
    return os.path.basename(_root()).removeprefix("ltss_scratch_")
