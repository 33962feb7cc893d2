"""Skew-aware relational operators: salted two-phase aggregation and the
replicated (salted) shuffle join.

Why these exist (SURVEY.md §2.7, §4.3): at 100 TB a handful of hot keys —
one event type with 40% of the rows, one mega-document — turns a single
``groupBy``/``join`` reducer into the job's critical path.  AQE splits
skewed *join* partitions but does nothing for a skewed aggregation key, and
nothing when the skew lives upstream of a UDF stage.  The classic fixes:

- **salted aggregation** — aggregate on (key, salt) first so every hot key
  fans out over S reducers, then re-aggregate the S partials.  Valid for any
  algebraic aggregate (sum/count/min/max; avg = sum/count).
- **replicated skew join** — when the dim side is too big to broadcast but
  the fact side's keys are skewed: replicate each dim row S times with an
  explicit salt, salt the fact side with pmod(hash, S), join on (key, salt).
  Each hot key now lands on S reducers instead of one.

Both transformations are *result-identical* to their naive forms, which is
exactly what makes them oracle-checkable: the DuckDB twin runs the plain
GROUP BY / JOIN.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salt_column", "salted_agg", "replicated_skew_join"]


def salt_column(entropy: Column, buckets: int) -> Column:
    """Deterministic salt in [0, buckets): pmod(xxhash64(e), S). Feed it a
    high-cardinality column (an id) so hot grouping keys spread evenly."""
    return F.pmod(F.xxhash64(entropy), F.lit(buckets))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    entropy: Column,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``aggs`` maps output name -> (function, column) with function in
    {sum, count, min, max}. Phase 1 aggregates by (keys..., salt) — the map
    side already partially aggregates, and each hot key spreads over
    ``buckets`` reducers; phase 2 merges the partials on the true keys. The
    merge function for count is sum; min/max are idempotent.
    """
    merge = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first = {"sum": F.sum, "count": lambda c: F.count(c), "min": F.min, "max": F.max}
    partial = (
        df.withColumn("_salt", salt_column(entropy, buckets))
        .groupBy(*keys, "_salt")
        .agg(*[first[fn](col).alias(name) for name, (fn, col) in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[merge[fn](name).alias(name) for name, (fn, col) in aggs.items()]
    )


def replicated_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    entropy: Column,
    buckets: int = 8,
) -> DataFrame:
    """Inner join ``fact ⋈ dim`` on ``key`` that survives hot fact keys.

    The dim side is exploded ``buckets`` × (acceptable when |dim| ≪ |fact|
    but beyond the broadcast threshold); the fact side gets a deterministic
    salt from ``entropy``. Every (key, salt) shuffle bucket then holds
    ~1/buckets of a hot key's rows. Result == plain inner join.
    """
    salted_fact = fact.withColumn("_salt", salt_column(entropy, buckets))
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return salted_fact.join(replicated_dim, [key, "_salt"]).drop("_salt")


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` on the same key (inner semantics — left rows
    with no prior right row are dropped).

    Implemented as the union + running ``last(ignorenulls)`` window trick:
    ONE shuffle on the key, state bounded by the window frame — never the
    range-join candidate explosion (left×right per key) a naive
    ``ts >= ts`` join condition produces. Right rows must be unique per
    (key, ts); pre-aggregate ties away first.
    """
    from pyspark.sql.window import Window

    # payload travels inside ONE struct that is non-null on every right row
    # (even when all payload VALUES are null), so last(ignorenulls) tracks
    # "was there a right row" — a genuine NULL payload value at the true
    # as-of match is returned as NULL instead of falling back to an older
    # non-null value.
    rtypes = dict(right.dtypes)
    payload_struct = F.struct(*[F.col(c) for c in payload])
    null_struct = F.lit(None).cast(
        "struct<" + ",".join(f"{c}:{rtypes[c]}" for c in payload) + ">"
    )
    lcols = [c for c in left.columns]
    l = left.select(
        *lcols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        null_struct.alias("_p"),
    )
    r = right.select(
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in lcols
            if c != key
        ],
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        payload_struct.alias("_p"),
    )
    u = l.unionByName(r)
    # right rows sort before left rows at equal ts → inclusive (<=) semantics
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *lcols,
        "_side",
        F.last("_p", ignorenulls=True).over(w).alias("_p"),
    )
    return (
        filled.filter((F.col("_side") == 1) & F.col("_p").isNotNull())
        .select(*lcols, *[F.col(f"_p.{c}").alias(c) for c in payload])
    )


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    order_tiebreak: str = "event_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event on the same key exceeds ``gap``. Adds a per-key
    ``session_idx`` (1-based) — one shuffle on the key, two window passes,
    no state beyond the frame. The classic training-data/log-pipeline
    operator; SQL-identical semantics keep it oracle-checkable.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(ts, order_tiebreak)
    prev = F.lag(ts).over(w)
    new_session = F.when(
        prev.isNull() | ((F.col(ts) - prev) > F.expr(f"INTERVAL {gap}")), 1
    ).otherwise(0)
    run = (
        Window.partitionBy(key)
        .orderBy(ts, order_tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.withColumn("session_idx", F.sum(new_session).over(run))
