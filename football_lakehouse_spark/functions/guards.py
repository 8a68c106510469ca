"""Runtime enforcement of the audited driver-materialisation bounds.

The static collect-lint (scripts/plan_lint.py COLLECT_ALLOW) names a
size bound for every allowed driver materialisation in the package —
but a static audit can't stop a CALLER from drifting (a "centroid
table, n_cells rows" collect silently materialising a million rows
after a refactor). :func:`bounded_collect` turns each named bound into
an actual runtime assertion: it fetches ``max_rows + 1`` through a
``limit`` (so the driver never holds more than one row past the audit
claim, even when the input would be huge) and fails LOUDLY when the
claim is exceeded.

Every COLLECT_ALLOW entry either collects through this helper or is
the helper itself; the lint treats direct ``bounded_collect(...)``
call sites exactly like raw ``.collect()`` sites, so the allowlist
stays a faithful audit of who materialises what.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row


class CollectBoundExceeded(RuntimeError):
    """A driver materialisation exceeded its audited size bound."""


#: backstop for control-plane tables (centroid/hot-cell lists): 2^20
#: rows ≈ a few tens of MB on the driver — far above any configured
#: n_cells × dim, far below an accidental data-plane materialisation.
CONTROL_PLANE_BOUND = 1 << 20

#: backstop for ops-surface metadata listings (commit history, snapshot
#: logs, table properties): version/property counts, not data.
OPS_METADATA_BOUND = 1_000_000

#: backstop for live-file listings (ops surface): a 100 TB table at
#: 128 MB files is ~800k files; beyond 10M the caller should work with
#: the distributed files metadata table instead of a driver list.
FILE_LISTING_BOUND = 10_000_000

#: partition dirs one write may touch (rewrite "removed" lists): a
#: single batch touching more partitions than this is a partitioning
#: bug, not a workload.
PER_WRITE_PARTITION_BOUND = 100_000


def bounded_collect(df: DataFrame, max_rows: int, site: str) -> list[Row]:
    """``df.collect()`` with the audited bound enforced at runtime.

    ``max_rows`` is the site's audited bound (COLLECT_ALLOW names it);
    ``site`` is a short label for the error message. Fetches at most
    ``max_rows + 1`` rows — a violating caller costs one extra row on
    the driver, not an OOM — and raises :class:`CollectBoundExceeded`
    instead of silently materialising more than the audit claims.
    """
    if max_rows < 0:
        raise ValueError(f"{site}: max_rows must be >= 0, got {max_rows}")
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise CollectBoundExceeded(
            f"{site}: driver materialisation returned more than its "
            f"audited bound of {max_rows} rows — the caller drifted from "
            "its COLLECT_ALLOW claim (scripts/plan_lint.py); restore the "
            "bound or re-audit the site"
        )
    return rows
