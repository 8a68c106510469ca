"""Horizon aggregation — the reference's signature Gold computation.

Re-expression of ``notebooks/04_gold/42_build_fixture_horizons.py``
(reference, see SURVEY.md §2 ops U1/P4/P5/A1/JN1/D1/O3): unpivot
home/away difficulty readings, filter to an anchor window, compute
h3/h5/h8 grouped aggregates, assemble with left joins, dedup on grain,
rank top-k.

Scale notes (100 TB): the unpivot is a narrow map (no shuffle); each
horizon agg is one hash-aggregate shuffle on ``team_id`` (partial
aggregation map-side); the three aggregate outputs are dimension-sized
(one row per team) so the assembly joins are broadcast, not shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def unpivot_roles(
    df: DataFrame,
    key: str,
    period: F.Column | str,
    readings: dict[str, F.Column],
    key_alias: str = "team_id",
    period_alias: str = "gw",
    value_alias: str = "fdr",
) -> DataFrame:
    """Home/away-style unpivot (reference U1): one input row becomes one
    row per reading, all conformed to ``(key, period, value)``.

    Narrow transformation — no shuffle; Catalyst pushes column pruning
    into the scan for each branch.
    """
    period_col = F.col(period) if isinstance(period, str) else period
    parts = [
        df.select(
            F.col(key).alias(key_alias),
            period_col.alias(period_alias),
            reading.alias(value_alias),
        )
        for reading in readings.values()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def horizon_aggregate(
    unpivoted: DataFrame,
    anchor: int,
    horizon: int,
    prefix: str,
    key: str = "team_id",
    period: str = "gw",
    value: str = "fdr",
) -> DataFrame:
    """One h-N aggregate (reference A1/P5): bounded period range →
    grouped avg + count. Averages rounded to 4 dp for cross-engine
    stability of the value hash."""
    # bigint accumulation: fdr micros ≤ 5e6/row → overflow needs ~2e12
    # rows per team; decimal(38) sums are 5-10× slower (not codegen'd).
    # The DIVISION is exact `div` on a decimal cast of the sum: a bigint
    # sum past 2^53 would promote `/` to double and floor one off the
    # oracle's 128-bit `//` — a 1000× earlier cliff than the overflow
    # the accumulator note prices (q199/q55 bug class).
    micros = F.floor(F.col(value) * F.lit(1000000.0) + F.lit(0.5)).cast("bigint")
    return (
        unpivoted.where(
            (F.col(period) >= F.lit(anchor)) & (F.col(period) < F.lit(anchor + horizon))
        )
        .groupBy(key)
        .agg(
            # micro-unit floor average (functions.scalars rationale): a
            # plain round(avg(double),4) diverges from the oracle at
            # scale because float summation order differs per engine
            F.sum(micros).alias("__sm"),
            F.count(F.lit(1)).alias(f"{prefix}_n"),
        )
        .select(
            key,
            (
                F.expr(
                    f"cast(__sm as decimal(38,0)) div ({prefix}_n * 100)"
                ).cast("double")
                / 10000
            ).alias(f"{prefix}_avg_fdr"),
            f"{prefix}_n",
        )
    )


def unpivot_roles_fused(
    df: DataFrame,
    key: str,
    period: F.Column | str,
    readings: dict[str, F.Column],
    key_alias: str = "team_id",
    period_alias: str = "gw",
    value_alias: str = "fdr",
) -> DataFrame:
    """Single-scan unpivot: ``explode(array(readings...))`` instead of a
    union of per-reading projections. Same rows as :func:`unpivot_roles`
    but the source is scanned once — at 100 TB the union form reads the
    table once per reading, which dominates the plan."""
    period_col = F.col(period) if isinstance(period, str) else period
    return df.select(
        F.col(key).alias(key_alias),
        period_col.alias(period_alias),
        F.explode(F.array(*readings.values())).alias(value_alias),
    )


def fused_horizon_features(
    unpivoted: DataFrame,
    anchor: int,
    horizons: tuple[int, ...] = (3, 5, 8),
    key: str = "team_id",
    period: str = "gw",
    value: str = "fdr",
) -> DataFrame:
    """All horizon windows in ONE grouped aggregate via conditional
    aggregation — the scale-path equivalent of
    ``horizon_aggregate`` × N + ``assemble_horizons``.

    Because every window shares the anchor start, team ∈ h3 ⇒ team ∈
    h5 ⇒ team ∈ h8; the reference's h3-driven left-join assembly is
    therefore equivalent to one aggregate over the widest window with a
    ``HAVING h3_n > 0`` filter. One scan + one shuffle replaces
    2×N scans + N shuffles + (N-1) joins.
    """
    widest = max(horizons)
    base = unpivoted.where(
        (F.col(period) >= F.lit(anchor)) & (F.col(period) < F.lit(anchor + widest))
    )
    aggs = []
    outs = [F.col(key)]
    for h in sorted(horizons):
        in_window = F.col(period) < F.lit(anchor + h)
        micros = F.floor(
            F.when(in_window, F.col(value)) * F.lit(1000000.0) + F.lit(0.5)
        ).cast("bigint")
        n_in = F.count(F.when(in_window, F.lit(1)))
        aggs.append(F.sum(micros).alias(f"__sm{h}"))
        aggs.append(n_in.alias(f"h{h}_n"))
        # exact `div` on the decimal-cast sum — see horizon_slice's note.
        # n=0 guard: the narrowest-window filter runs AFTER this select,
        # so a team with zero in-window rows must not divide by zero
        # (ANSI) while being computed only to be filtered away
        outs.append(
            F.when(
                F.col(f"h{h}_n") > 0,
                F.expr(f"cast(__sm{h} as decimal(38,0)) div (h{h}_n * 100)")
                .cast("double")
                / 10000,
            ).alias(f"h{h}_avg_fdr")
        )
        outs.append(F.col(f"h{h}_n"))
    narrowest = min(horizons)
    return (
        base.groupBy(key)
        .agg(*aggs)
        .select(*outs)
        .where(F.col(f"h{narrowest}_n") > 0)
    )


def assemble_horizons(
    h3: DataFrame, h5: DataFrame, h8: DataFrame, key: str = "team_id"
) -> DataFrame:
    """Left-join assembly of the three horizon aggregates (reference
    JN1). All three inputs are per-team aggregates — dimension-sized —
    so broadcast the right sides to avoid shuffle joins at scale."""
    return h3.join(F.broadcast(h5), key, "left").join(F.broadcast(h8), key, "left")
