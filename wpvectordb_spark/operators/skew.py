"""Skew-handling utilities for heavy-hitter keys at scale.

AQE's skew-join splitting covers sort-merge joins automatically; these
cover the aggregation side: a single hot key (one user generating 30% of
events, one boilerplate document fingerprint) funnels its whole group
through one reducer.  ``salted_agg`` runs decomposable aggregates in two
stages — partial aggregation over ``(key, salt)`` spreads the hot key
over ``salt_buckets`` reducers, then a cheap final merge over the
now-tiny partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation for decomposable functions.

    ``aggs`` maps output name -> (input column, fn) with fn in
    {'sum', 'count', 'min', 'max'} (the merge of each is itself).
    Equivalent to ``df.groupBy(*key_cols).agg(...)`` for these functions,
    but a hot key's rows spread over ``salt_buckets`` partial groups
    before the final single-row-per-key merge.
    """
    partial_exprs = []
    final_exprs = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(col).alias(f"_p_{out}"))
            final_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"_p_{out}"))
            final_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(f"_p_{out}"))
            final_exprs.append(F.min(f"_p_{out}").alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(f"_p_{out}"))
            final_exprs.append(F.max(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate: {fn}")
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = salted.groupBy(*key_cols, "_salt").agg(*partial_exprs)
    return partial.groupBy(*key_cols).agg(*final_exprs)
