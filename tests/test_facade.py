"""End-to-end facade tests: the reference's class API driven through a
full lifecycle over parquet-backed state."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from wpvectordb_spark.table import VectorTable, VectorTableQueue


def test_vector_table_lifecycle(spark, tmp_path):
    vt = VectorTable(spark, str(tmp_path / "vectors"), vector_length=4)
    vt.init()
    assert vt.table_exists()
    assert vt.get_vector_count() == 0

    # insert_all: document with 2 chunks
    vt.insert_all(100, [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]])
    assert vt.get_vector_count() == 2
    chunks = vt.get_all_for_post(100).orderBy("sequence_no").collect()
    assert [c["sequence_no"] for c in chunks] == [0, 1]
    assert chunks[0]["magnitude"] == pytest.approx(1.0)
    assert chunks[0]["binary_code"] == [8]  # bits 1000 -> 8

    # upsert replaces one chunk, derived columns refresh
    vt.upsert(100, 0, [3.0, 4.0, 0.0, 0.0])
    got = vt.get(100, 0).collect()[0]
    assert got["magnitude"] == pytest.approx(5.0)
    assert vt.get_vector_count() == 2

    # point reads
    some_id = vt.get_all().collect()[0]["id"]
    assert vt.id(some_id).count() == 1
    assert vt.ids([some_id]).count() == 1
    assert vt.get_latest_updated(100).count() == 1

    # search end-to-end over stored index
    top = vt.search([3.0, 4.0, 0.0, 0.0], n=1).collect()
    assert top[0]["post_id"] == 100
    assert top[0]["cosine_similarity"] == pytest.approx(1.0, abs=1e-9)

    # delete + drop
    vt.delete(some_id)
    assert vt.get_vector_count() == 1
    vt.drop_table()
    assert not vt.table_exists()


def test_vector_table_replacement_semantics(spark, tmp_path):
    vt = VectorTable(spark, str(tmp_path / "v2"), vector_length=2)
    vt.init()
    vt.insert_all(7, [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    assert vt.get_all_for_post(7).count() == 3
    vt.insert_all(7, [[9.0, 9.0]])  # document replacement (C8)
    assert vt.get_all_for_post(7).count() == 1


def test_queue_lifecycle(spark, tmp_path):
    q = VectorTableQueue(spark, str(tmp_path / "queue"))
    q.init()
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    q.add_posts([10, 20, 30], now=t0)
    q.add_post(20, now=t0)  # duplicate -> dropped
    assert q.get_total_records() == 3
    assert q.get_stats() == {"completed": 0, "failed": 0, "pending": 3, "processing": 0}

    batch = q.get_next_batch(2, now=t0 + dt.timedelta(minutes=1))
    assert batch.count() == 2
    assert q.get_stats() == {"completed": 0, "failed": 0, "pending": 1, "processing": 2}

    claimed_ids = [r["job_id"] for r in batch.collect()]
    q.update_status([claimed_ids[0]], "completed", now=t0 + dt.timedelta(minutes=2))
    q.update_status([claimed_ids[1]], "failed", "boom", now=t0 + dt.timedelta(minutes=2))
    st = q.get_stats()
    assert st["completed"] == 1 and st["failed"] == 1

    retry = q.get_posts_to_retry().collect()
    assert [r["job_id"] for r in retry] == [claimed_ids[1]]

    q.reset_post(30)
    q.delete_record(claimed_ids[0])
    assert q.get_total_records() == 2
    page = q.get_page_of_records(1, per_page=10)
    assert page.count() == 2
