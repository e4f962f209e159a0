"""As-of and interval join tests: golden semantics + equivalence with the
naive (non-scalable) formulations."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from wpvectordb_spark.operators.joins import asof_join, interval_join
from wpvectordb_spark.operators.events import sessionize
from wpvectordb_spark.sources.loaders import load_events
from tests.conftest import SF_DIR


def T(minute, second=0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


def test_asof_join_golden(spark):
    quotes = spark.createDataFrame(
        [(1, T(0), 100.0), (1, T(5), 101.0), (1, T(10), 102.0), (2, T(3), 50.0)],
        "sym long, ts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [(1, T(4), "a"), (1, T(5), "b"), (1, T(12), "c"), (2, T(1), "d"), (3, T(2), "e")],
        "sym long, ts timestamp, trade string",
    )
    out = {r["trade"]: r["px_asof"] for r in asof_join(trades, quotes, "sym").collect()}
    assert out == {
        "a": 100.0,  # latest quote at/before 10:04
        "b": 101.0,  # quote AT 10:05 matches (<= semantics)
        "c": 102.0,
        "d": None,   # no quote yet for sym 2 at 10:01
        "e": None,   # sym 3 has no quotes at all
    }


def test_asof_join_matches_naive_on_real_data(spark):
    """Union-trick as-of == naive per-row max-correlated subquery result,
    on real events: each 'purchase' joined to the user's latest 'click'
    at or before it."""
    ev = load_events(spark, SF_DIR)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"), "value"
    )
    fast = asof_join(purchases, clicks, "user_id", right_cols=["click_id"])
    # naive: join all pairs, keep latest click per purchase
    pairs = purchases.alias("p").join(
        clicks.alias("c"),
        (F.col("p.user_id") == F.col("c.user_id")) & (F.col("c.ts") <= F.col("p.ts")),
        "left",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("p.purchase_id").orderBy(
        F.col("c.ts").desc_nulls_last(), F.col("c.click_id").desc_nulls_last()
    )
    naive = (
        pairs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(F.col("p.purchase_id").alias("purchase_id"), F.col("c.click_id").alias("click_id"))
    )
    f = {r["purchase_id"]: r["click_id_asof"] for r in fast.collect()}
    n = {r["purchase_id"]: r["click_id"] for r in naive.collect()}
    # ties at identical (user, ts) may pick different click ids between the
    # two formulations only if two clicks share a microsecond — assert equal
    assert f == n


def test_interval_join_golden(spark):
    iv = spark.createDataFrame(
        [(1, T(0), T(10), "w1"), (1, T(8), T(20), "w2"), (2, T(0), T(5), "w3")],
        "user_id long, start timestamp, end timestamp, tag string",
    )
    ev = spark.createDataFrame(
        [(1, T(9), 100), (1, T(15), 101), (1, T(25), 102), (2, T(5), 103)],
        "user_id long, ts timestamp, event_id long",
    )
    out = {}
    for r in interval_join(ev, iv, "user_id", bin_width_seconds=120).collect():
        out.setdefault(r["event_id"], set()).add(r["tag"])
    assert out == {100: {"w1", "w2"}, 101: {"w2"}, 103: {"w3"}}  # 102 matches nothing


def test_interval_join_matches_naive_against_sessions(spark):
    """Binned interval join == naive inequality join, events vs their own
    session windows (every event must land in >= 1 of its user's
    sessions)."""
    ev = load_events(spark, SF_DIR).select("user_id", "ts", "event_id")
    sessions = sessionize(load_events(spark, SF_DIR)).select(
        "user_id",
        F.col("session_start").alias("start"),
        F.col("session_end").alias("end"),
        "session_no",
    )
    binned = interval_join(ev, sessions, "user_id", bin_width_seconds=1800)
    naive = ev.join(sessions, "user_id").where(
        (F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end"))
    )
    bset = {(r["event_id"], r["session_no"]) for r in binned.collect()}
    nset = {(r["event_id"], r["session_no"]) for r in naive.collect()}
    assert bset == nset
    # every event belongs to at least one session
    assert len({e for e, _ in bset}) == ev.count()


def test_asof_carries_whole_row_not_mixed_columns(spark):
    """The carried right row is atomic: a NULL column in the most recent
    right row stays NULL instead of being backfilled from an OLDER row."""
    import datetime as dt

    from wpvectordb_spark.operators.joins import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    right = spark.createDataFrame(
        [(1, t(1), 10.0, 5), (1, t(2), None, 7)],
        "user_id long, ts timestamp, price double, qty long",
    )
    left = spark.createDataFrame([(1, t(3), 100)], "user_id long, ts timestamp, order_id long")
    row = asof_join(left, right, "user_id", right_cols=["price", "qty"], tiebreak_col="qty").collect()[0]
    assert row["qty_asof"] == 7
    assert row["price_asof"] is None  # NOT 10.0 from the older row
