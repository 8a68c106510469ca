"""Persistent per-query scratch space for queries that must write real
tables/files and hand back a LAZY reader.

A ``tempfile.TemporaryDirectory`` inside a query wrapper forces a
driver-side ``collect()`` to outlive the directory — an O(data) driver
bottleneck at scale. Instead, each query writes under a stable named
scratch dir that survives the wrapper's return; the NEXT invocation of
the same query wipes and recreates it (so repeated runs don't
accumulate), and the returned DataFrame stays distributed end to end.

Location: ``$FLS_SCRATCH_ROOT`` if set, else ``<system tmp>/fls-scratch``.
On a cluster this would point at transient object storage; the contract
(write → lazy read-back, cleaned on next run) is identical.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid


def scratch_dir(name: str) -> str:
    """Return a fresh, empty scratch directory for query ``name``,
    removing any previous run's output for that name first."""
    root = os.environ.get(
        "FLS_SCRATCH_ROOT", os.path.join(tempfile.gettempdir(), "fls-scratch")
    )
    base = os.path.join(root, name)
    shutil.rmtree(base, ignore_errors=True)
    # unique suffix: a reader from the PREVIOUS run may still hold the old
    # path open; never reuse a path within a process lifetime
    fresh = os.path.join(base, uuid.uuid4().hex[:8])
    os.makedirs(fresh)
    return fresh
