"""Text primitive tests: golden values + Spark<->DuckDB fragment parity on
real documents (the property that makes every dedup oracle possible)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wpvectordb_spark.functions import text as X
from tests.conftest import SF_DIR, assert_parity


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_tokens_golden(spark):
    df = spark.createDataFrame([("Hello,  World! 42 foo-bar",)], "t string")
    got = df.select(X.tokens("t").alias("r")).collect()[0]["r"]
    assert got == ["hello", "world", "42", "foo", "bar"]


def test_string_hash_golden(spark):
    # h("ab") = (97*31 + 98) % M = 3105
    df = spark.createDataFrame([("ab",), ("",)], "t string")
    got = [r["h"] for r in df.select(X.string_hash("t").alias("h")).collect()]
    assert got[0] == 97 * 31 + 98
    assert got[1] == 0  # empty string -> fold init


def test_shingles_golden(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "t string")
    got = [r["s"] for r in df.select(X.shingles("t", 3).alias("s")).collect()]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == ["a b"]  # shorter than k -> single short shingle


def test_minhash_is_min_of_rehashes(spark):
    df = spark.createDataFrame([("x y",)], "t string")
    row = df.select(
        X.token_hashes("t").alias("h"),
        X.minhash_signature(X.token_hashes("t"), 4).alias("sig"),
    ).collect()[0]
    hs = row["h"]
    p = X.MINHASH_PRIME
    for i, s in enumerate(row["sig"]):
        a = (X.MINHASH_A * (i + 1)) % p
        b = (X.MINHASH_B * (i + 1) + 12345) % p
        assert s == min((a * x + b) % p for x in hs)


def test_minhash_similar_texts_share_values(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy cat"),
         (3, "completely different words entirely elsewhere")],
        "id long, t string",
    )
    sigs = {r["id"]: r["s"] for r in df.select("id", X.minhash_signature(X.token_hashes("t"), 32).alias("s")).collect()}
    overlap_12 = sum(a == b for a, b in zip(sigs[1], sigs[2]))
    overlap_13 = sum(a == b for a, b in zip(sigs[1], sigs[3]))
    assert overlap_12 > overlap_13
    assert overlap_12 >= 16  # 8/9 token jaccard


def test_empty_text_null_signatures(spark):
    df = spark.createDataFrame([("!!!",)], "t string")
    row = df.select(
        X.minhash_signature(X.token_hashes("t"), 4).alias("sig"),
        X.simhash(X.token_hashes("t")).alias("sh"),
    ).collect()[0]
    assert row["sig"] is None and row["sh"] is None


def test_simhash_properties(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy cat"),
         (3, "completely different words entirely elsewhere")],
        "id long, t string",
    )
    sh = {r["id"]: r["s"] for r in df.select("id", X.simhash(X.token_hashes("t")).alias("s")).collect()}
    assert all(0 <= v < 2**32 for v in sh.values())
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(sh[1], sh[2]) < ham(sh[1], sh[3])


def test_fragments_parity_on_documents(spark, duck, docs):
    q = docs.select(
        "doc_id",
        F.size(X.tokens("text")).alias("n_tokens"),
        X.string_hash("text").alias("fp"),
        X.minhash_signature(X.token_hashes("text"), 8).alias("sig"),
        X.simhash(X.token_hashes("text")).alias("sh"),
        # DuckDB's list_distinct is unordered (Spark's array_distinct keeps
        # first occurrence): compare shingle SETS via sort.
        F.array_sort(X.shingles("text", 3)).alias("sh3"),
    ).where(F.col("doc_id") < 40)
    o = duck.sql(
        f"""
        SELECT doc_id,
               CAST(len({X.sql_tokens('text')}) AS INT) AS n_tokens,
               {X.sql_string_hash('text')} AS fp,
               {X.sql_minhash_signature(X.sql_token_hashes('text'), 8)} AS sig,
               {X.sql_simhash(X.sql_token_hashes('text'))} AS sh,
               list_sort({X.sql_shingles('text', 3)}) AS sh3
        FROM documents WHERE doc_id < 40
        """
    )
    assert_parity(q, o)
