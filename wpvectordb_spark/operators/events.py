"""Event-stream batch analytics: tumbling/sliding windows, sessionization,
per-user activity — the aggregation patterns of a telemetry pipeline.

Batch forms here (the driver testdata is a static events table); the
streaming module reuses the same column logic under ``readStream`` with
watermarks.  Every operator is groupBy/window over native expressions —
one shuffle each, pre-aggregated map-side by Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MINUTES = 30


def tumbling_window_agg(
    events: DataFrame,
    width: str = "1 hour",
    ts_col: str = "ts",
    exact_distinct: bool = False,
) -> DataFrame:
    """Per-window, per-event-type counts and value sums.  Uses ``window()``
    (struct start/end) — the same expression Structured Streaming uses, so
    the batch and stream plans share logic.

    ``n_users`` defaults to ``approx_count_distinct`` (HLL, folds into the
    same single shuffle as the other aggregates — what the streaming form
    already uses, streams.py); ``exact_distinct=True`` opts into the exact
    count, whose per-(window, type) distinct is a second full shuffle of
    user ids — fine at test SF, the wrong default at 100 TB.  Mirrors
    ``user_activity``'s exact/approx pairing; the oracle checks the exact
    arm (HLL results are implementation-defined)."""
    n_users = (
        F.count_distinct("user_id")
        if exact_distinct
        else F.approx_count_distinct("user_id")
    )
    return (
        events.groupBy(F.window(ts_col, width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            n_users.alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "15 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Overlapping windows: each event lands in width/slide windows."""
    return (
        events.groupBy(F.window(ts_col, width, slide).alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


def sessionize(
    events: DataFrame,
    gap_minutes: int = SESSION_GAP_MINUTES,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the user's
    inter-event gap reaches ``gap_minutes``.  Classic two-window form —
    lag to flag boundaries, running sum to number sessions; one shuffle
    on user_id covers both windows.

    Boundary semantics are ``gap >= threshold`` starts a new session —
    EXACTLY Structured Streaming's native ``session_window`` (half-open
    ``[start, last + gap)``), so batch and stream sessionizers agree on
    events landing precisely on the gap boundary."""
    w_user = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
    # microsecond-exact gap (unix_micros) — second-truncated arithmetic
    # diverges from interval comparisons at the boundary
    gap = F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(F.col(ts_col)).over(w_user))
    is_new = F.when(gap.isNull() | (gap >= gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    numbered = events.withColumn("_new", is_new).withColumn(
        "session_no", F.sum("_new").over(w_user.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        numbered.groupBy(user_col, "session_no")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def user_activity(events: DataFrame) -> DataFrame:
    """Per-user rollup with exact + approximate distinct counts (the
    approx variant is the 100 TB path — constant memory per key)."""
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.count_distinct("event_type").alias("n_types"),
        F.approx_count_distinct("event_type").alias("n_types_approx"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
    )


def user_profile(events: DataFrame, types: list[str] | None = None) -> DataFrame:
    """Per-user wide profile: the ``user_activity`` rollup plus one pivoted
    count column per event type — ONE aggregation pass / ONE shuffle
    (conditional counts instead of a separate pivot + join)."""
    if types is None:
        types = ["click", "view", "signup", "purchase", "error"]
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.count_distinct("event_type").alias("n_types"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        *[
            F.count(F.when(F.col("event_type") == t, F.lit(1))).alias(t)
            for t in types
        ],
    )


def conversion_funnel(
    events: DataFrame,
    first_type: str = "signup",
    then_type: str = "purchase",
    within_hours: int = 24,
) -> DataFrame:
    """Conversion funnel: users whose first ``first_type`` event is
    followed by a ``then_type`` event within the window.

    ``then_t`` is the first ``then_type`` event AT OR AFTER the user's
    first ``first_type`` event — a global min would let a purchase that
    PRECEDES the signup mask a later qualifying one, reporting the user
    unconverted.  The per-type-min pre-aggregation computes per-user
    first_t with one map-side-combined shuffle; the qualifying then_t
    comes from joining first_t back (broadcast: one row per converting
    user) and re-aggregating only ``then_type`` events."""
    firsts = (
        events.where(F.col("event_type") == first_type)
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_t"))
    )
    thens = (
        events.where(F.col("event_type") == then_type)
        .select("user_id", "ts")
        .join(firsts, "user_id")
        .where(F.col("ts") >= F.col("first_t"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("then_t"))
    )
    agg = firsts.join(thens, "user_id", "left")
    converted = (
        F.col("then_t").isNotNull()
        & (
            F.unix_micros(F.col("then_t")) - F.unix_micros(F.col("first_t"))
            <= within_hours * 3600 * 1_000_000
        )
    )
    return agg.select(
        "user_id",
        "first_t",
        "then_t",
        converted.cast("int").alias("converted"),
    )


def event_type_funnel(events: DataFrame) -> DataFrame:
    """Per-type totals — the trivial rollup, one map-side-combined shuffle."""
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.round(F.avg("value"), 9).alias("avg_value"),
    )
