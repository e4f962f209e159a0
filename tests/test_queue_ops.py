"""Queue state-machine tests (SURVEY.md §5.4): scripted
add -> claim -> fail -> retry -> cleanup sequences asserting status /
error_count / timestamps after each step (VectorTableQueue.php:184-332)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from wpvectordb_spark.operators import queue_ops as Q
from wpvectordb_spark.schemas import QUEUE_SCHEMA

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def mk(minutes: int) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture()
def empty(spark):
    return spark.createDataFrame([], QUEUE_SCHEMA)


def jobs(spark, *pairs):
    return spark.createDataFrame(list(pairs), "job_id long, post_id long")


def snap(df):
    return {
        r["job_id"]: (r["status"], r["error_count"], r["start_time"], r["end_time"])
        for r in df.collect()
    }


def test_add_claim_complete_fail_retry_cleanup(spark, empty):
    # J1/J2: enqueue 3, duplicate post dropped
    q = Q.add_posts(empty, jobs(spark, (1, 100), (2, 200), (3, 300)), mk(0))
    q = Q.add_posts(q, jobs(spark, (4, 200), (5, 400)), mk(1))  # 200 is dup
    s = snap(q)
    assert set(s) == {1, 2, 3, 5}
    assert all(v[0] == "pending" for v in s.values())

    # J3: claim 2 oldest pending
    claimed, q = Q.claim_batch(q, mk(2), batch_size=2)
    cids = {r["job_id"] for r in claimed.collect()}
    assert cids == {1, 2}  # queued_time then job_id tie-break
    s = snap(q)
    assert s[1][0] == "processing" and s[1][2] is not None
    assert s[3][0] == "pending"

    # J4: one completes, one fails
    q = Q.update_status(q, [1], "completed", mk(3))
    q = Q.update_status(q, [2], "failed", mk(3), error_message="boom")
    s = snap(q)
    assert s[1][0] == "completed" and s[1][3] is not None
    assert s[2] == ("failed", 1, s[2][2], s[2][3])

    # J5: stats in one agg, zero-preserving like the reference's five
    # COUNTs (absent statuses report 0, not a missing key)
    st = {r["status"]: r["n"] for r in Q.stats(q).collect()}
    assert st == {"completed": 1, "failed": 1, "pending": 2, "processing": 0}

    # J3 again: pending (3,5) claimed before retryable failed (2)
    claimed, q = Q.claim_batch(q, mk(4), batch_size=3)
    assert {r["job_id"] for r in claimed.collect()} == {3, 5, 2}
    # J7 retry eligibility reflects error_count < 3
    q = Q.update_status(q, [2, 3, 5], "failed", mk(5), error_message="x")
    assert {r["job_id"] for r in Q.posts_to_retry(q).collect()} == {2, 3, 5}
    q2 = Q.update_status(q, [2], "failed", mk(6))
    q2 = Q.update_status(q2, [2], "failed", mk(7))
    s = snap(q2)
    assert s[2][1] == 4  # over the retry limit now
    assert {r["job_id"] for r in Q.posts_to_retry(q2).collect()} == {3, 5}

    # J6b: error_count > 3 purged
    q3 = Q.cleanup(q2, mk(8))
    assert 2 not in snap(q3)


def test_cleanup_stuck_and_retention(spark, empty):
    q = Q.add_posts(empty, jobs(spark, (1, 1), (2, 2), (3, 3)), mk(0))
    claimed, q = Q.claim_batch(q, mk(1), batch_size=1)  # job 1 -> processing
    # job 1 stuck: 16 minutes after start, no end_time -> failed +1
    q = Q.cleanup(q, mk(17))
    s = snap(q)
    assert s[1][0] == "failed" and s[1][1] == 1

    # completed retention: complete job 2 then jump 4 days
    claimed, q = Q.claim_batch(q, mk(18), batch_size=1)
    q = Q.update_status(q, [r["job_id"] for r in claimed.collect()], "completed", mk(19))
    q = Q.cleanup(q, mk(19 + 4 * 24 * 60))
    statuses = {r["job_id"]: r["status"] for r in q.collect()}
    assert all(v != "completed" for v in statuses.values())


def test_reset_and_deletes(spark, empty):
    q = Q.add_posts(empty, jobs(spark, (1, 100), (2, 200)), mk(0))
    _, q = Q.claim_batch(q, mk(1), batch_size=2)
    q = Q.reset_post(q, 100)
    s = snap(q)
    assert s[1] == ("pending", 0, None, None)
    assert Q.delete_post(q, 200).count() == 1
    assert Q.delete_record(q, 1).count() == 1
    assert Q.total_records(q) == 2


def test_update_status_whitelist(spark, empty):
    q = Q.add_posts(empty, jobs(spark, (1, 1)), mk(0))
    with pytest.raises(ValueError):
        Q.update_status(q, [1], "pending", mk(1))


def test_pagination(spark, empty):
    q = Q.add_posts(empty, jobs(spark, *[(i, i * 10) for i in range(1, 8)]), mk(0))
    p1 = Q.page_of_records(q, page=1, per_page=3)
    p2 = Q.page_of_records(q, page=2, per_page=3)
    p3 = Q.page_of_records(q, page=3, per_page=3)
    assert p1.count() == 3 and p2.count() == 3 and p3.count() == 1
    all_ids = [r["job_id"] for p in (p1, p2, p3) for r in p.collect()]
    assert sorted(all_ids) == list(range(1, 8))


def test_reclaimed_job_can_still_time_out(spark, empty):
    """Regression for the fixed reference bug: a job that failed (end_time
    set), got re-claimed, then wedged MUST still hit the stuck sweep —
    the claim clears end_time so cleanup's end_time-IS-NULL predicate can
    fire (the reference left the stale end_time and lost the job as
    'processing' forever)."""
    q = Q.add_posts(empty, jobs(spark, (1, 1)), mk(0))
    _, q = Q.claim_batch(q, mk(1), batch_size=1)
    q = Q.update_status(q, [1], "failed", mk(2), error_message="boom")
    _, q = Q.claim_batch(q, mk(3), batch_size=1)  # re-claim the failed job
    row = q.collect()[0]
    assert row["status"] == "processing" and row["end_time"] is None
    q = Q.cleanup(q, mk(3 + 16))  # 16 min after the re-claim start
    row = q.collect()[0]
    assert row["status"] == "failed" and row["error_count"] == 2


def test_success_clears_stale_error_message(spark, empty):
    """J4 overwrites error_message on BOTH statuses (reference writes the
    column unconditionally): complete-after-fail must not keep 'boom'."""
    q = Q.add_posts(empty, jobs(spark, (1, 1)), mk(0))
    _, q = Q.claim_batch(q, mk(1), batch_size=1)
    q = Q.update_status(q, [1], "failed", mk(2), error_message="boom")
    _, q = Q.claim_batch(q, mk(3), batch_size=1)
    q = Q.update_status(q, [1], "completed", mk(4))
    row = q.collect()[0]
    assert row["status"] == "completed" and row["error_message"] is None


def test_add_posts_enforces_job_id_uniqueness(spark, empty):
    """Structural PK guard: in-batch job_id collisions keep the min post;
    ids already queued are rejected."""
    q = Q.add_posts(empty, jobs(spark, (1, 100), (1, 200), (2, 300)), mk(0))
    s = {r["job_id"]: r["post_id"] for r in q.collect()}
    assert s == {1: 100, 2: 300}
    # a later batch re-using job_id 2 with a NEW post must not enter
    q = Q.add_posts(q, jobs(spark, (2, 400), (3, 500)), mk(1))
    s = {r["job_id"]: r["post_id"] for r in q.collect()}
    assert s == {1: 100, 2: 300, 3: 500}


def test_mark_processing_matches_claim_update(spark, empty):
    """The facade's two-phase path (collect ids, then mark) produces the
    same state as claim_batch's joined rewrite."""
    q = Q.add_posts(empty, jobs(spark, (1, 1), (2, 2), (3, 3)), mk(0))
    _, joined = Q.claim_batch(q, mk(1), batch_size=2)
    ids = [r["job_id"] for r in Q.dequeue_priority(q, 2).collect()]
    marked = Q.mark_processing(q, ids, mk(1))
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, marked.collect()))
