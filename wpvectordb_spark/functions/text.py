"""Text primitives for the LLM-data-pipeline operators: tokenization,
portable deterministic hashing, shingles, MinHash / SimHash signatures.

Everything is built from Catalyst higher-order functions so it runs
JVM-side at scale, and every builder has an adjacent DuckDB SQL fragment
producing identical values (the oracle contract).

Hashing is a 31-base polynomial rolling hash over Unicode code points,
mod 1e9+7 — chosen over xxhash64/murmur because it is expressible
identically in ANY engine (the oracle requirement); values stay < 2^30 so
MinHash's affine rehash ``(a*x + b) % (2^31-1)`` never overflows signed 64.
For pure-Spark pipelines where oracle parity is not needed, ``xxhash64`` is
the faster path — see ``token_hashes_fast``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_MOD = 1_000_000_007
MINHASH_PRIME = 2_147_483_647  # 2^31 - 1, prime
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# --- tokenization -----------------------------------------------------------

def tokens(text: Column | str) -> Column:
    """Lowercase word tokens (alnum runs)."""
    return F.filter(
        F.split(F.lower(_col(text)), TOKEN_SPLIT_RE), lambda t: t != ""
    )


def sql_tokens(text: str) -> str:
    return (
        f"list_filter(string_split_regex(lower({text}), '{TOKEN_SPLIT_RE}'),"
        " t -> t != '')"
    )


# --- polynomial rolling hash -------------------------------------------------

def string_hash(s: Column | str) -> Column:
    """``h = fold(chars, h*31 + codepoint) % (1e9+7)`` — the portable hash."""
    s = _col(s)
    chars = F.transform(
        F.sequence(F.lit(1), F.length(s)), lambda i: F.ascii(F.substring(s, i, F.lit(1)))
    )
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda a, c: (a * 31 + c.cast("long")) % HASH_MOD,
    )


def sql_string_hash(s: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, length({s}) + 1),"
        f" i -> CAST(ascii({s}[i]) AS BIGINT)), (a, c) -> (a * 31 + c) % {HASH_MOD})"
    )


def token_hashes(text: Column | str) -> Column:
    """Hash of every token of ``text`` (portable)."""
    return F.transform(tokens(text), lambda t: _elem_hash(t))


def _elem_hash(t: Column) -> Column:
    chars = F.transform(
        F.sequence(F.lit(1), F.length(t)), lambda i: F.ascii(F.substring(t, i, F.lit(1)))
    )
    return F.aggregate(
        chars, F.lit(0).cast("long"), lambda a, c: (a * 31 + c.cast("long")) % HASH_MOD
    )


def sql_token_hashes(text: str) -> str:
    inner = (
        "list_reduce(list_transform(range(1, length(t) + 1),"
        f" i -> CAST(ascii(t[i]) AS BIGINT)), (a, c) -> (a * 31 + c) % {HASH_MOD})"
    )
    return f"list_transform({sql_tokens(text)}, t -> {inner})"


def sql_hash_elements(list_expr: str) -> str:
    """DuckDB: polynomial hash of every string element of a list —
    mirrors ``F.transform(arr, _elem_hash)``."""
    inner = (
        "list_reduce(list_transform(range(1, length(t) + 1),"
        f" i -> CAST(ascii(t[i]) AS BIGINT)), (a, c) -> (a * 31 + c) % {HASH_MOD})"
    )
    return f"list_transform({list_expr}, t -> {inner})"


def token_hashes_fast(text: Column | str) -> Column:
    """Scale path: 64-bit xxhash per token (JVM intrinsic, no char loop).
    Not oracle-portable; use for production pipelines."""
    return F.transform(tokens(text), lambda t: F.xxhash64(t))


# --- shingles ----------------------------------------------------------------

def shingles(text: Column | str, k: int = 3) -> Column:
    """k-token shingles joined by a space; distinct set."""
    toks = tokens(text)
    n = F.size(toks)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
            lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
        )
    )


def sql_shingles(text: str, k: int = 3) -> str:
    toks = sql_tokens(text)
    return (
        f"list_distinct(list_transform(range(0, greatest(len({toks}) - {k}, 0) + 1),"
        f" i -> array_to_string(({toks})[i+1 : i+{k}], ' ')))"
    )


# --- MinHash -----------------------------------------------------------------

# Affine rehash coefficients: the multiplier must be LARGE so products wrap
# mod p and destroy magnitude ordering (small multipliers like (2i+1) keep
# the globally-smallest token hash the argmin of every rehash).  Knuth's
# multiplicative constant scaled per hash index; a < p and x < 2^30 keep
# a*x + b < 2^61, safe in signed 64 in any engine.
MINHASH_A = 2_654_435_761
MINHASH_B = 97_531


def minhash_signature(hashes: Column | str, num_hashes: int = 32) -> Column:
    """MinHash signature: ``sig[i] = min over token hashes of
    (a_i * h + b_i) % (2^31-1)`` with ``a_i = (K*(i+1)) % p`` (Knuth
    multiplicative rehash).  Null for empty token sets."""
    hs = _col(hashes)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(
                hs,
                lambda x: (
                    ((F.lit(MINHASH_A) * (i + 1)) % MINHASH_PRIME) * x
                    + (F.lit(MINHASH_B) * (i + 1) + 12345) % MINHASH_PRIME
                )
                % MINHASH_PRIME,
            )
        ),
    )
    return F.when(F.size(hs) > 0, sig)


def sql_minhash_signature(hashes: str, num_hashes: int = 32) -> str:
    sig = (
        f"list_transform(range(0, {num_hashes}), i -> list_min(list_transform({hashes},"
        f" x -> ((({MINHASH_A} * (i + 1)) % {MINHASH_PRIME}) * x"
        f" + ({MINHASH_B} * (i + 1) + 12345) % {MINHASH_PRIME}) % {MINHASH_PRIME})))"
    )
    return f"CASE WHEN len({hashes}) > 0 THEN {sig} END"


def lsh_band_keys(signature: Column | str, bands: int, rows_per_band: int) -> Column:
    """Band the signature: array of ``bands`` string keys, each the joined
    slice of ``rows_per_band`` signature values.  Equal key in any band =
    LSH candidate pair."""
    sig = _col(signature)
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.array_join(F.slice(sig, b * rows_per_band + 1, rows_per_band), "-"),
    )


def sql_lsh_band_keys(signature: str, bands: int, rows_per_band: int) -> str:
    return (
        f"list_transform(range(0, {bands}), b -> array_to_string("
        f"({signature})[b*{rows_per_band}+1 : b*{rows_per_band}+{rows_per_band}], '-'))"
    )


# --- SimHash -----------------------------------------------------------------

def simhash(hashes: Column | str, bits: int = 32) -> Column:
    """SimHash over token hashes: bit i of the output is the sign of
    ``sum(+1 if bit i of token hash else -1)``; packed with the same
    ``acc*2 + bit`` fold as sign codes.  Null for empty token sets."""
    hs = _col(hashes)
    bit_of = lambda h, i: (h / F.pow(F.lit(2.0), i.cast("double"))).cast("long") % 2
    bits_arr = F.transform(
        F.sequence(F.lit(bits - 1), F.lit(0), F.lit(-1)),
        lambda i: F.when(
            F.aggregate(
                hs,
                F.lit(0).cast("long"),
                lambda a, h: a + F.when(bit_of(h, i) == 1, 1).otherwise(-1),
            )
            > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    packed = F.aggregate(bits_arr, F.lit(0).cast("long"), lambda a, b: a * 2 + b)
    return F.when(F.size(hs) > 0, packed)


def sql_simhash(hashes: str, bits: int = 32) -> str:
    # floor before cast: DuckDB CAST(double AS BIGINT) rounds, Spark's cast
    # truncates — floor makes both truncate identically for positive h.
    bit_of = "CAST(floor(h / power(2, i)) AS BIGINT) % 2"
    bits_arr = (
        f"list_transform(range({bits - 1}, -1, -1), i -> CASE WHEN"
        f" list_reduce(list_prepend(0, list_transform({hashes},"
        f" h -> CASE WHEN {bit_of} = 1 THEN 1 ELSE -1 END)), (a, b) -> a + b) > 0"
        " THEN 1::BIGINT ELSE 0::BIGINT END)"
    )
    return (
        f"CASE WHEN len({hashes}) > 0 THEN"
        f" list_reduce({bits_arr}, (a, b) -> a * 2 + b) END"
    )
