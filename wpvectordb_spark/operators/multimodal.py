"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched Pandas functions via ``mapInPandas``.

The pattern a 100 TB multimodal corpus needs: media bytes ride as a
``binary`` column next to a metadata struct; per-item decode / feature
extraction runs in Python worker processes on Arrow record batches (never
row-at-a-time), and the Spark-side contract — schema, partitioning, batch
shape — is engine-managed.  The actual image/audio codecs are NOT in this
environment, so the decode step is stubbed: ``decode_media`` raises
``NotImplementedError`` unless handed the deterministic fake codec, while
everything around it (schemas, mapInPandas plumbing, batching) is real and
tested.

``media_features`` computes real byte-level features (length, first byte,
polynomial checksum matching functions.text.string_hash for pure-ASCII
payloads — the byte fold and the codepoint fold agree only when every
character is one byte; the entry-parity ASCII guard pins that
precondition) so outputs are oracle-checkable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

HASH_MOD = 1_000_000_007

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType()),
                    T.StructField("declared_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("first_byte", T.LongType()),
        T.StructField("checksum", T.LongType()),
    ]
)

VERIFY_FEATURE_SCHEMA = T.StructType(
    FEATURE_SCHEMA.fields + [T.StructField("verify", T.LongType())]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from documents: UTF-8 text bytes as the
    opaque payload (deterministic, so features are oracle-checkable)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text/plain").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.col("source").alias("source"),
            # octet length of the ACTUAL payload — n_chars undercounts
            # for multi-byte UTF-8 and would flag spurious corruption in
            # any declared-vs-measured integrity check
            F.length(F.encode("text", "UTF-8")).cast("long").alias("declared_bytes"),
        ).alias("meta"),
    )


# Growable per-worker cache of 31^i % HASH_MOD (ascending i).  The rolling
# hash h = ((...)*31 + b) % p is the polynomial sum(b_i * 31^(n-1-i)) % p, so
# a payload checksums as ONE numpy dot product against the reversed power
# vector instead of a per-byte Python loop (the loop was 37% of bench time).
_POW31 = np.array([1], dtype=np.int64)

# Chunk bound for the int64 dot product: each term is < 256 * HASH_MOD
# (~2.6e11), so 2^25 terms stay under 2^63.  Chunks reduce mod p as they go.
_CHUNK = 1 << 25

# Horner chunk for the per-payload path: CAPS the power table at 8 MB no
# matter the payload size.  An uncapped table grows 8 bytes per payload
# byte with a per-byte Python loop and is retained for the worker's
# lifetime — one 500 MB video payload would cost a 500M-iteration loop
# and 4 GB of permanently resident memory per Python worker.
_HORNER_CHUNK = 1 << 20


def _powers(n: int) -> np.ndarray:
    global _POW31
    if len(_POW31) < n:
        grow = np.empty(n, dtype=np.int64)
        grow[: len(_POW31)] = _POW31
        for i in range(len(_POW31), n):
            grow[i] = (grow[i - 1] * 31) % HASH_MOD
        _POW31 = grow
    return _POW31[:n]


def _checksum(data: bytes) -> int:
    """Polynomial rolling hash ``h = (h*31 + byte) % p`` over the payload,
    vectorized: Horner over _HORNER_CHUNK-sized pieces — per chunk, one
    numpy dot against the reversed power slice, then
    ``h = h * 31^len(chunk) + chunk_value`` (bit-identical to the single
    fold; the exponent comes from Python's 3-arg pow).  The chunking
    bounds BOTH the dot's int64 overflow (2^20 terms * 256*HASH_MOD <
    2^63) and the shared power table's size."""
    if not data:
        return 0
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    h = 0
    for s in range(0, len(arr), _HORNER_CHUNK):
        chunk = arr[s : s + _HORNER_CHUNK]
        m = len(chunk)
        coef = _powers(m)[m - 1 :: -1]
        h = (h * pow(31, m, HASH_MOD) + int(np.dot(chunk, coef))) % HASH_MOD
    return int(h)


def _batch_checksums(payloads: list[bytes]) -> np.ndarray:
    """Checksums for a whole Arrow batch in ONE numpy pass: concatenate
    payloads, build the per-segment reversed 31^i coefficient vector by
    slicing a shared power table, multiply elementwise, and segment-sum
    with ``np.add.reduceat``.  Per-document Python work is two slices —
    everything else is vectorized over the concatenated buffer.

    Falls back to the per-payload Horner ``_checksum`` when any single
    payload exceeds the Horner chunk (keeps the shared power table
    capped at 8 MB and the segment products inside the int64 bound)."""
    lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=len(payloads))
    if len(lens) == 0:
        return np.empty(0, dtype=np.int64)
    if lens.max(initial=0) >= _HORNER_CHUNK:
        return np.fromiter((_checksum(p) for p in payloads), dtype=np.int64, count=len(payloads))
    total = int(lens.sum())
    buf = np.frombuffer(b"".join(payloads), dtype=np.uint8).astype(np.int64)
    pw = _powers(int(lens.max(initial=1)))
    coef = np.empty(total, dtype=np.int64)
    starts = np.zeros(len(lens), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    for i, (s, n) in enumerate(zip(starts, lens)):
        coef[s : s + n] = pw[n - 1 :: -1] if n else 0
    if total == 0:
        return np.zeros(len(lens), dtype=np.int64)
    prods = (buf * coef) % HASH_MOD
    # reduceat segment sums: each segment < _CHUNK terms * HASH_MOD < 2^63.
    # Index ONLY non-empty segments' starts: empty segments share a start
    # with their successor (or sit past the end when last), and feeding
    # those duplicate/out-of-range indices to reduceat would split the
    # neighboring segment and corrupt its sum.  A non-empty segment always
    # runs exactly to the next non-empty start (empties contribute 0
    # bytes), so the non-empty starts are strictly increasing and valid.
    nonempty = lens > 0
    sums = np.zeros(len(lens), dtype=np.int64)
    sums[nonempty] = np.add.reduceat(prods, starts[nonempty])
    return sums % HASH_MOD


def _verify_digest(data: bytes) -> int:
    """Independent 64-bit digest (blake2b-8) as a signed int64 — the
    verify channel for byte_verify dedup.  Statistically independent of
    the base-31 polynomial checksum: payloads engineered (or unlucky
    enough) to collide on the mod-1e9+7 fold have a 2^-64 chance of also
    colliding here."""
    return int.from_bytes(
        hashlib.blake2b(data, digest_size=8).digest(), "big", signed=True
    )


def media_features(media: DataFrame, verify: bool = False) -> DataFrame:
    """Byte-level features via mapInPandas: Arrow batches in, Arrow batches
    out — the decode-stage shape without a codec dependency.  The whole
    batch checksums in one vectorized pass (see _batch_checksums).

    ``verify=True`` adds a ``verify`` column: an independent 64-bit
    blake2b digest of the payload (C-speed per payload via hashlib),
    computed in the SAME Arrow pass — no second scan, payloads still
    never leave the feature stage."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [p if p is not None else b"" for p in pdf["payload"]]
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=len(payloads))
            firsts = np.fromiter(
                (p[0] if p else -1 for p in payloads), dtype=np.int64, count=len(payloads)
            )
            cols = {
                "media_id": pdf["media_id"],
                "byte_len": lens,
                "first_byte": firsts,
                "checksum": _batch_checksums(payloads),
            }
            if verify:
                cols["verify"] = np.fromiter(
                    (_verify_digest(p) for p in payloads),
                    dtype=np.int64,
                    count=len(payloads),
                )
            yield pd.DataFrame(cols)

    schema = VERIFY_FEATURE_SCHEMA if verify else FEATURE_SCHEMA
    return media.select("media_id", "payload").mapInPandas(extract, schema)


def segment_media(
    media: DataFrame,
    chunk_bytes: int = 1 << 20,
    id_col: str = "media_id",
) -> DataFrame:
    """Byte-range segmentation of opaque payloads — the sharding step
    that parallelizes decode/feature work over LARGE media files: a
    500 MB video as one row pins its whole decode to one task, while
    ``ceil(len/chunk_bytes)`` chunk rows spread it across the cluster
    (stripe-parallel decode; reassemble by ``(id, chunk_no)``).  Pure
    Catalyst — one explode over the chunk-index sequence plus a binary
    ``substr`` per chunk, no shuffle, rides the scan.

    Returns ``(id, media_type, chunk_no, n_chunks, chunk)`` with
    ``chunk`` a binary slice of at most ``chunk_bytes``.  Empty and
    NULL payloads emit no chunks (a 0-byte file has nothing to decode;
    the guard also keeps ``sequence(0, -1)`` from emitting a DESCENDING
    index range, Spark's surprising default for stop < start)."""
    if chunk_bytes < 1:
        raise ValueError(f"segment_media: chunk_bytes={chunk_bytes} < 1")
    n_chunks = F.ceil(
        F.length("payload").cast("double") / F.lit(float(chunk_bytes))
    ).cast("int")
    idxs = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return (
        media.select(
            F.col(id_col),
            F.col("media_type"),
            F.col("payload"),
            n_chunks.alias("n_chunks"),
            F.explode(idxs).alias("chunk_no"),
        )
        .select(
            id_col,
            "media_type",
            "chunk_no",
            F.col("n_chunks").cast("long").alias("n_chunks"),
            F.col("payload")
            .substr(
                F.col("chunk_no") * chunk_bytes + 1, F.lit(chunk_bytes)
            )
            .alias("chunk"),
        )
    )


def media_exact_dedup(
    media: DataFrame,
    byte_verify: bool = False,
    features: DataFrame | None = None,
) -> DataFrame:
    """Exact dedup of OPAQUE media payloads — the binary-column analog of
    ``dedup.exact_dedup``: group by the byte-level feature triple
    (byte_len, first_byte, checksum), keep the smallest ``media_id`` as
    the canonical copy, report the group size.  An image/audio corpus
    carries byte-identical duplicates exactly like a text crawl does
    (mirrored CDNs, re-uploads), and payload bytes never need to leave
    the feature stage to find them.

    Returns ``(media_id, byte_len, first_byte, checksum, dup_count)`` —
    one row per DISTINCT payload.  Anti-join losers against the corpus
    to drop them, or use dup_count for soft weighting.

    Scale shape: the Arrow feature pass (one vectorized checksum per
    batch) followed by ONE map-side-combinable hash aggregation on the
    16-byte feature key — payloads themselves never shuffle.  Collision
    honesty: the rolling hash is mod 1e9+7 (~30 bits), so two UNRELATED
    payloads that already share byte_len and first_byte collide with
    probability ~2^-30 — fine for a crawl-scale corpus of varied sizes,
    but a corpus of millions of SAME-length fixed-format files has
    ~10^12 same-(len, first-byte) pairs and order-1000 expected false
    merges.  ``byte_verify=True`` closes that: the SAME Arrow pass also
    emits an independent 64-bit blake2b digest and the grouping key
    becomes the 4-tuple, cutting expected false merges on those 10^12
    pairs to ~10^12 * 2^-30 * 2^-64 ~ 5e-17 — a guarantee, not advice.
    Output columns are unchanged (the digest is dropped after grouping);
    payloads that collide on the triple but differ in bytes surface as
    SEPARATE rows sharing (byte_len, first_byte, checksum).  Cost: one
    hashlib call per payload inside the existing scan plus 8 bytes on
    the shuffle key — no extra pass, no payload shuffle.

    ``features=`` takes a precomputed :func:`media_features` frame to
    share ONE Arrow pass across calls (a ``verify=True`` frame serves
    both modes — the 3-key grouping simply ignores the digest column);
    callers sharing it across more than one consumer should barrier it
    (localCheckpoint) or the kernel re-runs per reference."""
    if byte_verify:
        feats = (
            features
            if features is not None
            else media_features(media, verify=True)
        )
        return (
            feats.groupBy("byte_len", "first_byte", "checksum", "verify")
            .agg(
                F.min("media_id").alias("media_id"),
                F.count("*").cast("long").alias("dup_count"),
            )
            .select(
                "media_id", "byte_len", "first_byte", "checksum", "dup_count"
            )
        )
    feats = features if features is not None else media_features(media)
    return (
        feats.groupBy("byte_len", "first_byte", "checksum")
        .agg(
            F.min("media_id").alias("media_id"),
            F.count("*").cast("long").alias("dup_count"),
        )
        .select("media_id", "byte_len", "first_byte", "checksum", "dup_count")
    )


def decode_media(
    media: DataFrame,
    codec: Callable[[str, bytes], dict] | None = None,
) -> DataFrame:
    """Decode stage stub.  A real deployment passes a codec (e.g. PIL/
    ffmpeg wrappers); this environment has none, so calling without a
    codec raises at plan-build time rather than failing mid-job.

    ``fake_codec`` provides a deterministic stand-in for tests.
    """
    if codec is None:
        raise NotImplementedError(
            "no media codec available in this environment; pass codec= "
            "(e.g. multimodal.fake_codec) — image/audio libraries are "
            "deliberately not bundled"
        )

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.LongType()),
            T.StructField("height", T.LongType()),
            T.StructField("n_frames", T.LongType()),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                # sanitize NULL payloads to b"" and NULL media types to ""
                # before the user callable: real PIL/ffmpeg codecs take
                # (str, bytes) and would raise TypeError/AttributeError
                # mid-job on None (media_features' precedent); an empty
                # type string is the codec's decision to reject, a typed
                # error instead of a worker stack trace
                {
                    "media_id": mid,
                    **codec(mt if mt is not None else "", pl if pl is not None else b""),
                }
                for mid, mt, pl in zip(pdf["media_id"], pdf["media_type"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=["media_id", "width", "height", "n_frames"])

    return media.select("media_id", "media_type", "payload").mapInPandas(
        decode, out_schema
    )


def fake_codec(media_type: str, payload: bytes) -> dict:
    """Deterministic stand-in codec: derives fake dimensions from payload
    bytes.  Replaces PIL/ffmpeg in tests."""
    n = len(payload) if payload is not None else 0
    return {
        "width": (n % 640) + 1,
        "height": ((n * 7) % 480) + 1,
        "n_frames": 1 if media_type.startswith(("image", "text")) else (n % 30) + 1,
    }


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.LongType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("frame_checksum", T.LongType()),
    ]
)


def sample_frames(
    media: DataFrame,
    k: int = 3,
    codec: Callable[[str, bytes], dict] | None = None,
    frame_extractor: Callable[[bytes, int], bytes] | None = None,
) -> DataFrame:
    """Uniform frame sampling: decode each item's frame count, pick ``k``
    evenly-spaced frame indices, extract each frame's bytes — a 1-to-N
    ``mapInPandas`` stage (one input row fans out to <= k frame rows, all
    inside the Arrow batch, no explode/shuffle).  Real deployments pass an
    ffmpeg-backed codec/extractor; this environment stubs both
    (``fake_codec`` / ``fake_frame_extractor``)."""
    if codec is None or frame_extractor is None:
        raise NotImplementedError(
            "no media codec available in this environment; pass codec= and "
            "frame_extractor= (e.g. fake_codec / fake_frame_extractor)"
        )
    if k < 1:
        raise ValueError("sample_frames: k must be >= 1")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mt, pl in zip(pdf["media_id"], pdf["media_type"], pdf["payload"]):
                pl = pl if pl is not None else b""
                mt = mt if mt is not None else ""  # decode_media's sanitize rule
                n_frames = int(codec(mt, pl)["n_frames"])
                if n_frames <= 0:
                    continue
                if n_frames <= k:
                    idxs = list(range(n_frames))
                elif k == 1:
                    idxs = [0]  # the k-1 spacing formula divides by zero
                else:
                    idxs = sorted({(j * (n_frames - 1)) // (k - 1) for j in range(k)})
                for i in idxs:
                    fb = frame_extractor(pl, i)
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_no": i,
                            "frame_bytes": len(fb),
                            "frame_checksum": _checksum(fb),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_no", "frame_bytes", "frame_checksum"]
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        sample, FRAME_SCHEMA
    )


def fake_frame_extractor(payload: bytes, idx: int) -> bytes:
    """Deterministic stand-in frame extractor: a rotating 16-byte slice of
    the payload (so different frames of the same item differ)."""
    if payload is None or len(payload) == 0:
        return b""
    start = (idx * 16) % len(payload)
    window = (payload + payload)[start : start + 16]
    return bytes(window)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
    ]
)


def resize_media(
    media: DataFrame,
    target_w: int,
    target_h: int,
    resizer: Callable[[str, bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize stage: re-encode every item's payload at (target_w,
    target_h) — the batch-preprocessing step of a vision training
    pipeline.  Same contract as ``decode_media``: a real deployment
    passes a PIL/ffmpeg-backed resizer; this environment has none, so
    calling without one raises at plan-build time, and
    ``fake_resizer`` exercises the REAL plumbing (binary-in/binary-out
    Arrow batches, 1-to-1 mapInPandas, no driver involvement, output
    payload + audit columns).

    Scale shape: a pure mapInPandas projection — parallelism is the
    partition count, payload bytes never shuffle (the output is written
    or consumed downstream partition-local unless the caller
    repartitions).
    """
    if resizer is None:
        raise NotImplementedError(
            "no media codec available in this environment; pass resizer= "
            "(e.g. multimodal.fake_resizer) — image/audio libraries are "
            "deliberately not bundled"
        )
    tw, th = int(target_w), int(target_h)

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = [
                # same sanitize rule as decode_media — fake_resizer
                # ignores media_type, but a real resizer dispatches on it
                # and would crash on None
                resizer(mt if mt is not None else "", pl if pl is not None else b"", tw, th)
                for mt, pl in zip(pdf["media_type"], pdf["payload"])
            ]
            # whole-batch numpy checksum pass, same as media_features —
            # the per-row Python fold was this module's measured 20x cost
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "width": tw,
                    "height": th,
                    "payload": outs,
                    "n_bytes": [len(o) for o in outs],
                    "checksum": _batch_checksums(outs),
                }
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        do_resize, RESIZE_SCHEMA
    )


def fake_resizer(media_type: str, payload: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in resizer: proportionally subsample/extend
    the payload to ``w*h // 256`` bytes (area-proportional size, stable
    across runs) so tests exercise real binary round-trips."""
    n_out = max(1, (w * h) // 256)
    if payload is None or len(payload) == 0:
        return b"\x00" * n_out
    reps = (n_out // len(payload)) + 1
    return (payload * reps)[:n_out]
