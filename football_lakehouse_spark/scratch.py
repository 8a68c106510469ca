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
import time
import uuid


#: run dirs retained per query name: the new run plus the most recent
#: prior run (whose lazy readers may still be alive in this process)
_KEEP_RUNS = 2


def scratch_dir(name: str) -> str:
    """Return a fresh, empty scratch directory for query ``name``,
    pruning all but the most recent prior run's output for that name.

    The immediately-previous run dir is kept alive so a lazy DataFrame
    returned by the prior invocation still reads; anything older is
    removed (bounded accumulation: at most ``_KEEP_RUNS`` dirs per
    name)."""
    root = os.environ.get(
        "FLS_SCRATCH_ROOT", os.path.join(tempfile.gettempdir(), "fls-scratch")
    )
    base = os.path.join(root, name)
    os.makedirs(base, exist_ok=True)
    # run dirs are named <ns-timestamp>-<uuid> so lexicographic order IS
    # creation order — filesystem mtimes can tie at coarse granularity
    prior = sorted(e.path for e in os.scandir(base) if e.is_dir())
    for stale in prior[: max(0, len(prior) - (_KEEP_RUNS - 1))]:
        shutil.rmtree(stale, ignore_errors=True)
    # unique suffix: never reuse a path within a process lifetime
    fresh = os.path.join(base, f"{time.time_ns():020d}-{uuid.uuid4().hex[:8]}")
    os.makedirs(fresh)
    return fresh
