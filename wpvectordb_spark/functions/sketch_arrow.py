"""Arrow/numpy fast paths for the sketch kernels.

The Catalyst HOF forms (functions.text.minhash_signature / simhash) are
pure-JVM single folds — the right default for a long-running cluster where
whole-stage/interpreted evaluation is JIT-warm.  But a fold that builds a
32-lane array accumulator per element is exactly the shape the JVM takes
longest to warm: a cold single-shot run (the bench, a one-off job) spends
several seconds in C2 compilation of the interpreted evaluator before the
arithmetic gets fast (measured: 6.8 s cold -> 1.7 s JIT-warm for the same
MinHash pipeline at sf0.1).

These variants move ONLY the inner arithmetic to numpy over Arrow batches
(one `np.minimum.reduceat` per permutation / one `np.add.reduceat` per
batch) and are BIT-IDENTICAL to the HOF forms — same constants, same
modular arithmetic, same null-for-empty semantics — asserted by
tests/test_sketch_arrow.py against the Catalyst kernels and by the driver's
DuckDB oracle (which mirrors the HOF form in SQL).

All int64 arithmetic stays in range: operands are < 2^31, so
a * h + b < 2^62 < int64 max.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wpvectordb_spark.functions.text import (
    MINHASH_A,
    MINHASH_B,
    MINHASH_PRIME,
)


def _segments(values: pd.Series) -> tuple[np.ndarray, np.ndarray, list[int]]:
    """Concatenate the non-null, non-empty array elements of an Arrow list
    column batch.  Returns (concat, segment_start_offsets, source_rows)."""
    arrs: list[np.ndarray] = []
    rows: list[int] = []
    for j, v in enumerate(values):
        if v is None:
            continue
        a = np.asarray(v, dtype=np.int64)
        if a.size == 0:
            continue
        arrs.append(a)
        rows.append(j)
    if not arrs:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64), rows
    concat = np.concatenate(arrs)
    offsets = np.zeros(len(arrs), dtype=np.int64)
    np.cumsum([a.size for a in arrs[:-1]], out=offsets[1:])
    return concat, offsets, rows


def minhash_signature_arrow(hashes: Column | str, num_hashes: int = 32) -> Column:
    """Arrow form of functions.text.minhash_signature:
    ``sig[i] = min over h of ((A*(i+1)) % P * h + (B*(i+1)+12345) % P) % P``
    vectorized as one rehash + segmented min per permutation."""
    i = np.arange(1, num_hashes + 1, dtype=np.int64)
    a = (MINHASH_A * i) % MINHASH_PRIME
    b = (MINHASH_B * i + 12345) % MINHASH_PRIME

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(hs: pd.Series) -> pd.Series:
        out: list[list[int] | None] = [None] * len(hs)
        concat, offsets, rows = _segments(hs)
        if not rows:
            return pd.Series(out)
        mins = np.empty((num_hashes, len(rows)), dtype=np.int64)
        for k in range(num_hashes):
            mins[k] = np.minimum.reduceat((a[k] * concat + b[k]) % MINHASH_PRIME, offsets)
        for col, j in enumerate(rows):
            out[j] = mins[:, col].tolist()
        return pd.Series(out)

    return _sig(hashes if isinstance(hashes, Column) else F.col(hashes))


def srp_simhash_arrow(hashes: Column | str, bits: int = 60) -> Column:
    """Arrow form of functions.text.srp_simhash: ``bits`` rehash-parity
    sign votes per token, vectorized as one (tokens x bits) parity matrix
    + segmented sum per batch.  Lane arithmetic: a*h < 2^62 stays in
    int64."""
    i = np.arange(1, bits + 1, dtype=np.int64)
    a = (MINHASH_A * i) % MINHASH_PRIME
    b = (MINHASH_B * i + 54321) % MINHASH_PRIME
    exps = np.arange(bits, dtype=np.int64)

    @F.pandas_udf(T.LongType())
    def _sh(hs: pd.Series) -> pd.Series:
        out: list[int | None] = [None] * len(hs)
        concat, offsets, rows = _segments(hs)
        if not rows:
            return pd.Series(out, dtype=object)
        # parity matrix lane-chunked to bound peak memory at ~tokens x 15
        sums = np.empty((len(rows), bits), dtype=np.int64)
        for lo in range(0, bits, 15):
            hi = min(lo + 15, bits)
            par = ((a[lo:hi] * concat[:, None] + b[lo:hi]) % MINHASH_PRIME) % 2
            sums[:, lo:hi] = np.add.reduceat(par * 2 - 1, offsets, axis=0)
        packed = ((sums > 0).astype(np.int64) << exps).sum(axis=1)
        for col, j in enumerate(rows):
            out[j] = int(packed[col])
        return pd.Series(out, dtype=object)

    return _sh(hashes if isinstance(hashes, Column) else F.col(hashes))


def simhash_arrow(hashes: Column | str, bits: int = 32) -> Column:
    """Arrow form of functions.text.simhash: bit i of the output is the
    sign of ``sum over token hashes of (2*bit_i(h) - 1)``; null for empty
    token sets.  Token hashes are < 2^31, so ``>> i & 1`` equals the HOF
    form's exact double division + truncating cast."""
    exps = np.arange(bits, dtype=np.int64)

    @F.pandas_udf(T.LongType())
    def _sh(hs: pd.Series) -> pd.Series:
        out: list[int | None] = [None] * len(hs)
        concat, offsets, rows = _segments(hs)
        if not rows:
            return pd.Series(out, dtype=object)
        contrib = (((concat[:, None] >> exps) & 1) * 2 - 1)  # N x bits in {-1,+1}
        sums = np.add.reduceat(contrib, offsets, axis=0)  # docs x bits
        packed = ((sums > 0).astype(np.int64) << exps).sum(axis=1)
        for col, j in enumerate(rows):
            out[j] = int(packed[col])
        return pd.Series(out, dtype=object)

    return _sh(hashes if isinstance(hashes, Column) else F.col(hashes))


def span_window_hashes_arrow(token_hashes: Column | str, k: int) -> Column:
    """Arrow form of the ExactSubstr window-hash fold in
    ``dedup._span_detection``: for every k-token window of a document's
    token-hash array, the packed ~60-bit hash

        h1 * HASH_MOD2 + h2
        h1 = fold over the window of (a * 31 + t) % HASH_MOD
        h2 = fold over the window of (a * HASH_MUL2 + t) % HASH_MOD2

    BIT-IDENTICAL to the Catalyst ``transform(sequence(...),
    i -> aggregate(slice(...)))`` form (same constants, same fold order,
    same empty-array-for-short/NULL semantics) — asserted by
    tests/test_sketch_arrow.py and the DuckDB oracle.  The HOF form
    re-slices and re-folds per window (O(k * tokens) interpreted
    lambda steps, ~16 modmuls/token at k=8); here the k fold steps are
    k vectorized passes over the batch's concatenated token hashes.

    Range: token hashes are < HASH_MOD < 2^30, so
    h1 * 31 + t < 2^35 and h2 * 131 + t < 2^38 stay exact in int64;
    the packed hash is < 1.1e18 < 2^63.  Windows spanning row
    boundaries in the concatenation are computed and discarded
    (k - 1 waste rows per document — negligible).
    """
    from wpvectordb_spark.functions.text import HASH_MOD, HASH_MOD2, HASH_MUL2

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _ws(ths: pd.Series) -> pd.Series:
        # [] (never NULL) for NULL/short rows — the HOF form's
        # when(size >= k, fold).otherwise(array()) contract
        out: list[list[int]] = [[] for _ in range(len(ths))]
        arrs: list[np.ndarray] = []
        rows: list[int] = []
        for j, v in enumerate(ths):
            if v is None:
                continue
            a = np.asarray(v, dtype=np.int64)
            if a.size < k:
                continue
            arrs.append(a)
            rows.append(j)
        if not rows:
            return pd.Series(out)
        lens = np.array([a.size for a in arrs], dtype=np.int64)
        offsets = np.zeros(len(arrs), dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        concat = np.concatenate(arrs)
        nw = concat.size - k + 1
        h1 = np.zeros(nw, dtype=np.int64)
        h2 = np.zeros(nw, dtype=np.int64)
        for j in range(k):
            seg = concat[j : j + nw]
            h1 = (h1 * 31 + seg) % HASH_MOD
            h2 = (h2 * HASH_MUL2 + seg) % HASH_MOD2
        ws = h1 * HASH_MOD2 + h2
        for i, row in enumerate(rows):
            o = int(offsets[i])
            out[row] = ws[o : o + int(lens[i]) - k + 1].tolist()
        return pd.Series(out)

    return _ws(
        token_hashes if isinstance(token_hashes, Column) else F.col(token_hashes)
    )
