"""Golden + property tests for vector kernels K1-K6 (SURVEY.md §5.2-5.3)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wpvectordb_spark.functions import kernels as K

VEC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.ArrayType(T.FloatType())),
    ]
)

GOLDEN = [
    (0, [3.0, 4.0]),
    (1, [0.0, 0.0]),  # zero vector -> eps guard
    (2, [-1.0, -2.0, -3.0]),  # all negative -> code 0
    (3, [1.0] * 70),  # dim not multiple of 32 -> short tail word
    (4, [0.0, 1.0, -1.0, 0.5]),  # sign rule: 0.0 -> bit 0
]


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(GOLDEN, VEC_SCHEMA)


def _one(df, col, id_):
    return df.where(F.col("id") == id_).select(col.alias("r")).collect()[0]["r"]


def test_magnitude_golden(vecs):
    assert _one(vecs, K.magnitude("v"), 0) == pytest.approx(5.0)
    assert _one(vecs, K.magnitude("v"), 1) == 0.0
    assert _one(vecs, K.magnitude("v"), 2) == pytest.approx(math.sqrt(14))


def test_normalize_golden_and_zero_guard(vecs):
    n = _one(vecs, K.normalize("v"), 0)
    assert n == pytest.approx([0.6, 0.8])
    # zero vector: divide by literal 1e-10, not by 0 (VectorTable.php:586)
    z = _one(vecs, K.normalize("v"), 1)
    assert z == [0.0, 0.0]


def test_normalize_idempotent(vecs):
    once = _one(vecs, K.magnitude(K.normalize("v")), 0)
    assert once == pytest.approx(1.0)


def test_sign_code_golden(vecs):
    # [3,4] -> bits 11 -> word 0b11 = 3
    assert _one(vecs, K.sign_code("v"), 0) == [3]
    # all-negative -> 0
    assert _one(vecs, K.sign_code("v"), 2) == [0]
    # 70 ones -> word0 = 2^32-1, word1 = 2^32-1, tail word of 6 ones = 63
    assert _one(vecs, K.sign_code("v"), 3) == [2**32 - 1, 2**32 - 1, 63]
    # 0.0 maps to bit 0: [0,1,-1,0.5] -> bits 0101 -> 5
    assert _one(vecs, K.sign_code("v"), 4) == [5]


def test_hamming_self_zero_and_symmetry(spark):
    df = spark.createDataFrame(
        [(1, [5, 9], [5, 9]), (2, [0b1010, 0], [0b0101, 1])],
        "id long, a array<long>, b array<long>",
    )
    r = {x["id"]: (x["ab"], x["ba"]) for x in df.select(
        "id",
        K.hamming("a", "b").alias("ab"),
        K.hamming("b", "a").alias("ba"),
    ).collect()}
    assert r[1] == (0, 0)
    assert r[2] == (5, 5)  # 1010^0101 = 1111 (4 bits) + 0^1 (1 bit)


def test_cosine_golden(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], [1.0, 0.0]), (2, [1.0, 0.0], [0.0, 1.0]), (3, [1.0, 2.0], [-1.0, -2.0])],
        "id long, q array<float>, v array<float>",
    )
    r = {x["id"]: x["c"] for x in df.select("id", K.cosine_similarity("q", "v").alias("c")).collect()}
    assert r[1] == pytest.approx(1.0, abs=1e-9)
    assert r[2] == pytest.approx(0.0, abs=1e-12)
    assert r[3] == pytest.approx(-1.0, abs=1e-9)
    assert all(abs(v) <= 1.0 + 1e-9 for v in r.values())


def test_cosine_with_precomputed_magnitudes(spark):
    df = spark.createDataFrame([(1, [3.0, 4.0], [3.0, 4.0], 5.0, 5.0)],
                               "id long, q array<float>, v array<float>, qm double, vm double")
    c = df.select(K.cosine_similarity("q", "v", "qm", "vm").alias("c")).collect()[0]["c"]
    assert c == pytest.approx(1.0, abs=1e-9)


def test_code_to_hex_roundtrip_format(vecs):
    # word 3 -> 8 hex chars zero padded
    h = _one(vecs, K.code_to_hex(K.sign_code("v")), 0)
    assert h == "00000003"


def test_kernels_against_duckdb_on_real_embeddings(spark, duck):
    """K1/K3/K6 parity on real sf0.01 embeddings vs DuckDB fragments."""
    from tests.conftest import SF_DIR, assert_parity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = (
        emb.select(
            "vec_id",
            F.round(K.magnitude("embedding"), 9).alias("mag"),
            K.sign_code("embedding").alias("code"),
        )
        .orderBy("vec_id")
        .limit(50)
    )
    o = duck.sql(
        f"""
        SELECT vec_id,
               round({K.sql_magnitude('embedding')}, 9) AS mag,
               {K.sql_sign_code('embedding')} AS code
        FROM embeddings ORDER BY vec_id LIMIT 50
        """
    )
    assert_parity(q, o)


def test_quantize_roundtrip_error_bound(spark):
    from tests.conftest import SF_DIR

    """Symmetric int8 quantization: |x - dequant(quant(x))| <= scale/2
    per element, codes stay in [-127, 127], zeros stay zeros."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").limit(50)
    out = emb.select(
        "vec_id",
        F.col("embedding").alias("v"),
        K.quantize_scale("embedding").alias("s"),
        K.quantize("embedding").alias("q"),
    ).select(
        "vec_id", "v", "s", "q", K.dequantize("q", "s").alias("back")
    )
    for r in out.collect():
        assert all(-127 <= c <= 127 for c in r["q"])
        for orig, rec in zip(r["v"], r["back"]):
            assert abs(float(orig) - rec) <= r["s"] / 2 + 1e-12


def test_quantized_cosine_tracks_exact(spark):
    from tests.conftest import SF_DIR

    """Quantized cosine drifts < 0.01 from the exact float cosine on real
    embeddings (scales cancel; only rounding noise remains)."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_vec"),
        K.quantize("embedding").alias("q_codes"),
        K.quantize_scale("embedding").alias("q_scale"),
    )
    out = (
        emb.limit(100)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            K.cosine_similarity("q_vec", "embedding", None, None).alias("exact"),
            K.quantized_cosine("q_codes", K.quantize("embedding")).alias("approx"),
        )
    )
    for r in out.collect():
        assert abs(r["exact"] - r["approx"]) < 0.01, (r["vec_id"], r["exact"], r["approx"])


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0, 0.0])], "id long, v array<float>")
    r = df.select(K.quantize("v").alias("q")).collect()[0]
    assert r["q"] == [0, 0, 0]
