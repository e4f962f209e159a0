"""Temporal join operators Spark lacks natively: as-of and interval joins.

* **as-of join** — for each left row, the most recent right row at or
  before the left timestamp, per key.  Implemented with the union trick:
  tag both sides, union, one window per key ordered by (ts, side), carry
  the last right value forward, keep left rows.  ONE shuffle on the key —
  no join node at all, so there is nothing to skew or broadcast; this is
  the shape kdb/Flink/QuestDB implement natively.

* **interval (range) join** — match events to [start, end] intervals per
  key.  A naive ``ts BETWEEN start AND end`` predicate compiles to
  BroadcastNestedLoopJoin (O(n*m) — unusable at scale).  The binned form
  buckets time on both sides, equi-joins on (key, bucket) — intervals
  register in every bucket they overlap — then applies the exact range
  filter.  Shuffle cost is linear in rows x avg buckets-per-interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """For each left row: the latest right row with
    ``right.ts <= left.ts`` on the same key (null columns when none).

    Ties on the same timestamp resolve right-before-left, i.e. a right
    row AT the left timestamp matches (<=, not <).  When multiple RIGHT
    rows share (key, ts), ``tiebreak_col`` (a right-side column, e.g. its
    id) makes the carried row deterministic — the HIGHEST tiebreak value
    wins; it defaults to the first ``right_cols`` entry.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, right_ts)]
    if tiebreak_col is None and right_cols:
        tiebreak_col = right_cols[0]

    l_tag = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    r_tag = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("_ats"),
            *[F.col(c) for c in right_cols],
        )
        .withColumn("_side", F.lit(0))
    )
    l_cols = [c for c in left.columns]
    merged = l_tag.unionByName(
        r_tag, allowMissingColumns=True
    )
    # right rows sort before left rows at equal timestamps -> <= semantics;
    # the tiebreak (asc, nulls first — left rows carry NULL there) makes
    # the LAST right row at an equal (key, ts) deterministic: max tiebreak.
    order_keys = [F.col("_ats").asc(), F.col("_side").asc()]
    if tiebreak_col is not None:
        order_keys.append(F.col(tiebreak_col).asc_nulls_first())
    w = Window.partitionBy(key).orderBy(*order_keys).rowsBetween(
        Window.unboundedPreceding, 0
    )
    # carry the right row as ONE struct (non-null whenever the row is a
    # right row) — carrying each column independently with ignorenulls
    # would mix values from DIFFERENT right rows whenever the most recent
    # one has a NULL in some column
    right_struct = F.last(
        F.when(F.col("_side") == 0, F.struct(*[F.col(c) for c in right_cols])),
        ignorenulls=True,
    ).over(w)
    carried = merged.select(
        *[F.col(c) for c in l_cols],
        F.col("_side"),
        right_struct.alias("_r"),
    ).select(
        *[F.col(c) for c in l_cols],
        F.col("_side"),
        *[F.col(f"_r.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    return carried.where(F.col("_side") == 1).drop("_side")


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    key: str,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_width_seconds: int = 3600,
) -> DataFrame:
    """Binned range join: event rows matched to every interval (same key)
    containing their timestamp, inclusive on both ends.

    Both sides bucket time into ``bin_width_seconds`` bins; intervals
    explode into each bin they overlap; the equi-join on (key, bin) is a
    normal shuffled hash join, and the exact containment filter runs on
    the matched pairs only.  Choose the bin width near the typical
    interval length: too small explodes interval copies, too large
    inflates candidate pairs.
    """
    bin_w = F.lit(bin_width_seconds * 1_000_000)
    ev = events.withColumn("_bin", (F.unix_micros(F.col(ts_col)) / bin_w).cast("long"))
    iv = intervals.withColumn(
        "_bins",
        F.sequence(
            (F.unix_micros(F.col(start_col)) / bin_w).cast("long"),
            (F.unix_micros(F.col(end_col)) / bin_w).cast("long"),
        ),
    ).withColumn("_bin", F.explode("_bins")).drop("_bins")
    joined = ev.join(iv, on=[key, "_bin"], how="inner").where(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    )
    return joined.drop("_bin")
