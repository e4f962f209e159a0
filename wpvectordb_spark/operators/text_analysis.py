"""Text analysis operators: language id, quality scoring, token stats,
document fingerprinting — the per-document scoring pass of a training-data
pipeline.  All pure Catalyst expressions (one narrow projection over the
corpus, no shuffle), each with a DuckDB-mirrored formula for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wpvectordb_spark.barrier import call_barrier
from wpvectordb_spark.functions import text as X

# Tiny per-language stopword lists for the n-gram/stopword-ratio heuristic.
# Order matters: ties resolve to the FIRST language in this list.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "ich", "mit", "ein", "zu", "nicht"),
    "fr": ("le", "la", "les", "et", "un", "une", "est", "pas", "pour", "que"),
    "es": ("el", "los", "las", "y", "un", "una", "es", "no", "por", "con"),
}


def _stopword_ratio(toks: Column, words: tuple[str, ...]) -> Column:
    hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks).cast("double")).otherwise(
        F.lit(0.0)
    )


def _sql_stopword_ratio(toks: str, words: tuple[str, ...]) -> str:
    wl = ", ".join(f"'{w}'" for w in words)
    return (
        f"CASE WHEN len({toks}) > 0 THEN"
        f" CAST(len(list_filter({toks}, t -> t IN ({wl}))) AS DOUBLE) / len({toks})"
        " ELSE 0.0 END"
    )


def _bind1(col: Column, fn) -> Column:
    """Evaluate ``col`` ONCE per row and feed it to ``fn`` as a bound
    lambda variable.  Interpreted-mode expression trees re-evaluate a
    repeated sub-expression PER REFERENCE (no common-subexpression
    elimination outside whole-stage codegen, and these HOF trees don't
    codegen), so e.g. an argmax CASE chain over k unprojected scores
    costs O(k^2) score evaluations, each re-running the token split.
    Wrapping the shared input in a one-element array and computing
    inside a ``transform`` lambda materializes it once; the body's
    references read the bound value.  Same arithmetic, same values —
    plan shape only (the collapse-proof cousin of PERFORMANCE.md item
    34's FINISH-lambda trick)."""
    return F.element_at(F.transform(F.array(col), fn), 1)


def language_id(text_col: Column | str = "text") -> Column:
    """Heuristic language id: argmax stopword-hit ratio over STOPWORDS,
    'und' (undetermined) when no list scores > 0.  Deterministic
    first-wins tie-break in STOPWORDS order.

    Evaluated via two one-element lambda binds (the token array, then
    the score vector — ``_bind1``): the round-6 pairwise CASE chain
    re-evaluated every unprojected score per comparison, costing
    O(|langs|^2) token splits PER ROW (the corpus_profile scale-sweep's
    dominant term).  ``array_position`` of the max is the same
    semantics — language i wins iff its score is positive, >= every
    later language's and > every earlier language's, i.e. the FIRST
    index attaining a positive maximum."""
    langs = list(STOPWORDS)
    langs_lit = F.array(*[F.lit(lang) for lang in langs])

    def scores_of(tk: Column) -> Column:
        return F.array(*[_stopword_ratio(tk, STOPWORDS[lang]) for lang in langs])

    def pick(sc: Column) -> Column:
        mx = F.array_max(sc)  # re-reads of the bound 5-element array are cheap
        return F.when(
            mx > 0,
            F.element_at(langs_lit, F.array_position(sc, mx).cast("int")),
        ).otherwise("und")

    return _bind1(_bind1(X.tokens(text_col), scores_of), pick)


def sql_language_id(text: str) -> str:
    toks = X.sql_tokens(text)
    scores = {lang: _sql_stopword_ratio(toks, words) for lang, words in STOPWORDS.items()}
    langs = list(STOPWORDS)
    cases = []
    for lang in langs:
        conds = [f"({scores[lang]}) > 0"]
        for other in langs:
            if other == lang:
                continue
            op = ">=" if langs.index(other) > langs.index(lang) else ">"
            conds.append(f"({scores[lang]}) {op} ({scores[other]})")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(cases) + " ELSE 'und' END"


#: every character the punctuation ratio does NOT count: alnum plus the
#: explicit whitespace set (space/tab/newline/CR — newlines/tabs are
#: document structure, not punctuation).  Explicit set, not \s — Java's
#: \s includes \x0B, RE2's does not, and the oracle must match
#: byte-for-byte.  Known ASCII-centric limit: non-ASCII letters still
#: count as punctuation (in BOTH engines' forms).
_ALNUM_SP = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 \t\n\r"
)


def _punct_count(t: Column) -> Column:
    """Characters outside ``_ALNUM_SP`` — ``length(translate(t, allowed,
    ''))`` deletes the allowed set with a plain char-map lookup.  Value-
    identical to the mirror's ``length(x) - length(regexp_replace(x,
    '[^a-zA-Z0-9 \\t\\n\\r]', '', 'g'))`` but regex-free: the replace
    form BUILDS a stripped copy of every document just to take its
    length (~70% of quality_score's cost in the round-7 scale sweep)."""
    return F.length(F.translate(t, _ALNUM_SP, ""))


def _compose_quality(tk: Column, punct_r: Column) -> Column:
    """The composite quality formula over a (bound) token array and the
    9-dp punctuation ratio — the SINGLE definition shared by
    ``quality_score`` and ``analyze``'s token struct (a second inline
    copy would drift silently from ``sql_quality_score``)."""
    mean_r = F.round(_mean_token_len(tk), 9)
    stop_r = F.round(_stopword_ratio(tk, STOPWORDS["en"]), 9)
    raw = (
        F.least(stop_r * 2.0, F.lit(1.0)) * 0.4
        + F.when((mean_r >= 3) & (mean_r <= 10), 1.0).otherwise(0.3) * 0.3
        + (1.0 - F.least(punct_r * 5.0, F.lit(1.0))) * 0.3
    )
    return F.round(raw, 9)


def _mean_token_len(tk: Column) -> Column:
    """Mean token length over a (bound) token array — the shared body of
    quality_features and quality_score."""
    n_tok = F.size(tk)
    return F.when(
        n_tok > 0,
        F.aggregate(tk, F.lit(0).cast("long"), lambda a, x: a + F.length(x)).cast(
            "double"
        )
        / n_tok.cast("double"),
    ).otherwise(F.lit(0.0))


def quality_features(text_col: Column | str = "text") -> dict[str, Column]:
    """Cheap quality signals: token count, mean token length, punctuation
    ratio, stopword ratio (en).  Each token-derived column lambda-binds
    its token array (``_bind1``): the mean/stopword expressions
    reference the array 3x each, and an unbound reference re-runs the
    split regex per reference in interpreted evaluation."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    n_char = F.length(t)
    punct = F.when(
        n_char > 0, _punct_count(t).cast("double") / n_char.cast("double")
    ).otherwise(F.lit(0.0))
    return {
        "n_tokens": F.size(X.tokens(text_col)).cast("long"),
        "mean_token_len": F.round(_bind1(X.tokens(text_col), _mean_token_len), 9),
        "punct_ratio": F.round(punct, 9),
        "stopword_ratio": F.round(
            _bind1(
                X.tokens(text_col),
                lambda tk: _stopword_ratio(tk, STOPWORDS["en"]),
            ),
            9,
        ),
    }


def sql_quality_features(text: str) -> dict[str, str]:
    toks = X.sql_tokens(text)
    n_tok = f"len({toks})"
    n_char = f"length({text})"
    # literal tab/newline/CR bytes inside the quoted pattern (legal in a
    # SQL string literal; constant pattern keeps the regex precompiled)
    alnum_sp = f"length(regexp_replace({text}, '[^a-zA-Z0-9 \t\n\r]', '', 'g'))"
    mean_tok = (
        f"CASE WHEN {n_tok} > 0 THEN CAST(list_reduce(list_prepend(0,"
        f" list_transform({toks}, x -> length(x))), (a, b) -> a + b) AS DOUBLE)"
        f" / {n_tok} ELSE 0.0 END"
    )
    punct = (
        f"CASE WHEN {n_char} > 0 THEN CAST({n_char} - {alnum_sp} AS DOUBLE)"
        f" / {n_char} ELSE 0.0 END"
    )
    return {
        "n_tokens": f"CAST({n_tok} AS BIGINT)",
        "mean_token_len": f"round({mean_tok}, 9)",
        "punct_ratio": f"round({punct}, 9)",
        "stopword_ratio": f"round({_sql_stopword_ratio(toks, STOPWORDS['en'])}, 9)",
    }


def quality_score(text_col: Column | str = "text") -> Column:
    """Composite quality score in [0, 1]: rewards stopword presence and
    moderate token lengths, penalizes punctuation density.

    Same formula as composing ``quality_features`` (each feature
    rounded to 9 dp first, identical arithmetic order), but the token
    array is lambda-bound once (``_bind1``) instead of re-split per
    feature reference — the interpreted tree otherwise runs the token
    regex 3x per row."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    n_char = F.length(t)
    punct = F.when(
        n_char > 0, _punct_count(t).cast("double") / n_char.cast("double")
    ).otherwise(F.lit(0.0))
    punct_r = F.round(punct, 9)

    return _bind1(X.tokens(text_col), lambda tk: _compose_quality(tk, punct_r))


def sql_quality_score(text: str) -> str:
    f = sql_quality_features(text)
    return (
        f"round(least(({f['stopword_ratio']}) * 2.0, 1.0) * 0.4"
        f" + (CASE WHEN ({f['mean_token_len']}) >= 3 AND ({f['mean_token_len']}) <= 10"
        "    THEN 1.0 ELSE 0.3 END) * 0.3"
        f" + (1.0 - least(({f['punct_ratio']}) * 5.0, 1.0)) * 0.3, 9)"
    )


def repetition_features(text_col: Column | str = "text") -> dict[str, Column]:
    """Gopher-style within-document repetition signals: fraction of
    duplicate lines and fraction of duplicate tokens (1 - distinct/total,
    0.0 for empty).  Pure array expressions — no shuffle."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    # \r?\n: splitting on \n alone leaves a trailing \r on every CRLF
    # line — blank lines then pass the non-empty filter (F.trim strips
    # only spaces) and dedupe against each other, inflating n_lines and
    # dup_line_ratio for clean CRLF documents
    lines = F.filter(F.split(t, "\\r?\\n"), lambda l: F.length(F.trim(l)) > 0)
    n_lines = F.size(lines)
    dup_lines = F.when(
        n_lines > 0,
        F.lit(1.0) - F.size(F.array_distinct(lines)).cast("double") / n_lines.cast("double"),
    ).otherwise(F.lit(0.0))
    toks = X.tokens(text_col)
    n_tok = F.size(toks)
    dup_toks = F.when(
        n_tok > 0,
        F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / n_tok.cast("double"),
    ).otherwise(F.lit(0.0))
    return {
        "n_lines": n_lines.cast("long"),
        "dup_line_ratio": F.round(dup_lines, 9),
        "dup_token_ratio": F.round(dup_toks, 9),
    }


def sql_repetition_features(text: str) -> dict[str, str]:
    lines = (
        f"list_filter(string_split_regex({text}, '\\r?\\n'),"
        " l -> length(trim(l)) > 0)"
    )
    toks = X.sql_tokens(text)
    dup_lines = (
        f"CASE WHEN len({lines}) > 0 THEN"
        f" 1.0 - CAST(len(list_distinct({lines})) AS DOUBLE) / len({lines})"
        " ELSE 0.0 END"
    )
    dup_toks = (
        f"CASE WHEN len({toks}) > 0 THEN"
        f" 1.0 - CAST(len(list_distinct({toks})) AS DOUBLE) / len({toks})"
        " ELSE 0.0 END"
    )
    return {
        "n_lines": f"CAST(len({lines}) AS BIGINT)",
        "dup_line_ratio": f"round({dup_lines}, 9)",
        "dup_token_ratio": f"round({dup_toks}, 9)",
    }


# PII / noise scrubbing rules, applied IN ORDER (URLs first so an email
# inside a URL is counted once, as part of the URL).  Patterns restricted
# to the syntax subset Java regex (Spark) and RE2 (DuckDB) agree on: no
# backreferences, no lookaround, explicit whitespace classes (Java's \s
# includes \x0B, RE2's does not).
PII_RULES: tuple[tuple[str, str, str], ...] = (
    # scheme case-insensitive via explicit classes (portable — no (?i)
    # flag dependence): HTTP:// was previously never redacted
    ("urls", "[Hh][Tt][Tt][Pp][Ss]?://[^ \t\n\r]+", "<URL>"),
    ("emails", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ips", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("long_numbers", "\\d{7,}", "<NUM>"),
)


def scrub_text(text_col: Column | str = "text") -> Column:
    """Redact PII-ish spans (URL, email, IPv4, 7+-digit runs) with typed
    placeholders and collapse whitespace runs.  Pure ``regexp_replace``
    chain — JVM-side, rides the scan, no shuffle, no UDF."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    for _, pat, repl in PII_RULES:
        t = F.regexp_replace(t, pat, repl)
    return F.trim(F.regexp_replace(t, "[ \t\n\r]+", " "))


def scrub_features(text_col: Column | str = "text") -> dict[str, Column]:
    """Per-rule redaction counts (measured on each rule's staged input,
    so a URL-embedded email counts as URL only) plus the cleaned text's
    length and portable fingerprint — the auditable summary of a scrub
    pass without shipping the cleaned body through the compare."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    out: dict[str, Column] = {}
    for name, pat, repl in PII_RULES:
        out[f"n_{name}"] = F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0))).cast("long")
        t = F.regexp_replace(t, pat, repl)
    clean = F.trim(F.regexp_replace(t, "[ \t\n\r]+", " "))
    out["clean_len"] = F.length(clean).cast("long")
    out["clean_fingerprint"] = X.string_hash(clean)
    return out


def pii_present(text_col: Column | str = "text") -> Column:
    """Boolean PII flag — true iff any of the first three PII_RULES
    (urls, emails, ips) matches.  Value-identical to
    ``(n_urls + n_emails + n_ips) > 0`` over ``scrub_features``'s
    STAGED counts — the corpus_profile mirror keeps that count form —
    by this argument: if rule *i* only matches inside a span an earlier
    rule redacted, that earlier rule already fired the flag; and if no
    earlier rule matched, the staged input IS the raw text
    (``regexp_replace`` with zero matches returns its input unchanged).
    So existence-on-raw-text ≡ existence-on-staged-inputs, and the flag
    needs NO replacement passes: three ``rlike`` probes on the raw
    column, zero string building, no lambda binds.

    The three patterns are fused into ONE alternation probed with a
    single ``rlike`` — and ``_profile_sums`` evaluates it in its OWN
    aggregate pass: a complex regex sharing one projection loop with
    lambda-HOF siblings runs ~10x slower than either alone, whichever
    regex form is used (round-7 scale sweep, PERFORMANCE.md item 51)."""
    assert [r[0] for r in PII_RULES[:3]] == ["urls", "emails", "ips"]
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    combined = "|".join(f"(?:{pat})" for _, pat, _repl in PII_RULES[:3])
    return t.rlike(combined)


def _sql_quote(pat: str) -> str:
    return pat.replace("'", "''")


def sql_scrub_features(text: str) -> dict[str, str]:
    t = text
    out: dict[str, str] = {}
    for name, pat, repl in PII_RULES:
        q = _sql_quote(pat)
        out[f"n_{name}"] = f"CAST(len(regexp_extract_all({t}, '{q}')) AS BIGINT)"
        t = f"regexp_replace({t}, '{q}', '{repl}', 'g')"
    clean = f"trim(regexp_replace({t}, '[ \t\n\r]+', ' ', 'g'))"
    out["clean_len"] = f"CAST(length({clean}) AS BIGINT)"
    out["clean_fingerprint"] = X.sql_string_hash(clean)
    return out


def analyze(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Full per-document analysis projection: one narrow pass.

    The five token-derived outputs (count, mean length, stopword ratio,
    distinct count, and the composite quality — same arithmetic as
    ``quality_score``, which rounds each 9-dp feature before composing)
    share ONE lambda-bound token split via a struct computed inside a
    single ``_bind1`` and extracted by field — a two-level select whose
    multi-referenced non-cheap struct alias CollapseProject leaves
    alone, so the split regex runs once per row instead of five times
    (measured 3.98 -> ~2.1 s per 320k rows; PERFORMANCE.md item 51
    family).  Values are identical to deriving each column separately
    (the text_analyze doc arm hash-checks them)."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    n_char = F.length(t)
    punct_r = F.round(
        F.when(
            n_char > 0, _punct_count(t).cast("double") / n_char.cast("double")
        ).otherwise(F.lit(0.0)),
        9,
    )

    def tok_feats(tk: Column) -> Column:
        return F.struct(
            F.size(tk).cast("long").alias("n_tokens"),
            F.round(_mean_token_len(tk), 9).alias("mean_token_len"),
            F.round(_stopword_ratio(tk, STOPWORDS["en"]), 9).alias(
                "stopword_ratio"
            ),
            F.size(F.array_distinct(tk)).cast("long").alias("n_unique_tokens"),
            _compose_quality(tk, punct_r).alias("quality"),
        )

    return docs.select(
        F.col(id_col),
        language_id(text_col).alias("lang_pred"),
        _bind1(X.tokens(text_col), tok_feats).alias("_tf"),
        punct_r.alias("punct_ratio"),
        X.string_hash(text_col).alias("fingerprint"),
    ).select(
        id_col,
        "lang_pred",
        F.col("_tf.n_tokens").alias("n_tokens"),
        F.col("_tf.mean_token_len").alias("mean_token_len"),
        "punct_ratio",
        F.col("_tf.stopword_ratio").alias("stopword_ratio"),
        F.col("_tf.n_unique_tokens").alias("n_unique_tokens"),
        F.col("_tf.quality").alias("quality"),
        "fingerprint",
    )


def _analyze_wide(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The non-regex half of ``analyze_full``: everything ``analyze``
    emits plus whitespace/BPE token counts and the Gopher repetition
    signals, with ONE struct-shared token split and ONE lines split
    (the same ``_bind1`` discipline as ``analyze`` — an unbound token
    reference re-runs the split regex per reference in interpreted
    evaluation)."""
    t = F.col(text_col) if isinstance(text_col, str) else text_col
    n_char = F.length(t)
    punct_r = F.round(
        F.when(
            n_char > 0, _punct_count(t).cast("double") / n_char.cast("double")
        ).otherwise(F.lit(0.0)),
        9,
    )

    def tok_feats(tk: Column) -> Column:
        n_tok = F.size(tk)
        dup = F.when(
            n_tok > 0,
            F.lit(1.0)
            - F.size(F.array_distinct(tk)).cast("double") / n_tok.cast("double"),
        ).otherwise(F.lit(0.0))
        return F.struct(
            n_tok.cast("long").alias("n_tokens"),
            F.round(_mean_token_len(tk), 9).alias("mean_token_len"),
            F.round(_stopword_ratio(tk, STOPWORDS["en"]), 9).alias(
                "stopword_ratio"
            ),
            F.size(F.array_distinct(tk)).cast("long").alias("n_unique_tokens"),
            _compose_quality(tk, punct_r).alias("quality"),
            F.round(dup, 9).alias("dup_token_ratio"),
        )

    lines = F.filter(F.split(t, "\\r?\\n"), lambda l: F.length(F.trim(l)) > 0)

    def line_feats(ln: Column) -> Column:
        n_l = F.size(ln)
        dupl = F.when(
            n_l > 0,
            F.lit(1.0)
            - F.size(F.array_distinct(ln)).cast("double") / n_l.cast("double"),
        ).otherwise(F.lit(0.0))
        return F.struct(
            n_l.cast("long").alias("n_lines"),
            F.round(dupl, 9).alias("dup_line_ratio"),
        )

    return docs.select(
        F.col(id_col),
        language_id(text_col).alias("lang_pred"),
        _bind1(X.tokens(text_col), tok_feats).alias("_tf"),
        punct_r.alias("punct_ratio"),
        X.string_hash(text_col).alias("fingerprint"),
        X.ws_token_count(text_col).alias("ws_tokens"),
        F.size(X.bpe_pretokens(text_col)).cast("long").alias("bpe_tokens"),
        _bind1(lines, line_feats).alias("_lf"),
    ).select(
        id_col,
        "lang_pred",
        F.col("_tf.n_tokens").alias("n_tokens"),
        F.col("_tf.mean_token_len").alias("mean_token_len"),
        "punct_ratio",
        F.col("_tf.stopword_ratio").alias("stopword_ratio"),
        F.col("_tf.n_unique_tokens").alias("n_unique_tokens"),
        F.col("_tf.quality").alias("quality"),
        "fingerprint",
        "ws_tokens",
        "bpe_tokens",
        F.col("_lf.n_lines").alias("n_lines"),
        F.col("_lf.dup_line_ratio").alias("dup_line_ratio"),
        F.col("_tf.dup_token_ratio").alias("dup_token_ratio"),
    )


def analyze_full(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fused: bool = True,
) -> DataFrame:
    """``analyze`` plus token-count variants (whitespace + BPE-ish),
    repetition signals, and PII-scrub audit columns.

    Default shape (``fused=True``): ONE projection — exactly one output
    row per input row, id-agnostic, safe for any caller.  Pass
    ``fused=False`` for the faster TWO-projection form merged by an
    ``id_col`` equi-join: the lambda-HOF family (one struct-shared
    token split) and the PII-scrub regex chain each get their OWN
    evaluation loop, because a complex regex sharing one projection
    loop with lambda siblings JIT-poisons the shared evaluator ~4x
    (PERFORMANCE.md item 51d/53).  The join moves only ~20 narrow
    feature columns, never the text: measured at 80k docs — fused
    36.9 s, lambda family alone 15.8, scrub alone 12.7, two-pass join
    28.3 s (the join shuffle is ~free; item 60).  Values are identical
    column-for-column (the text_analyze doc arm hash-checks them).

    Contract for ``fused=False``: UNIQUE, NON-NULL ``id_col`` values (a
    document primary key — the reference's posts.id, the wp_posts PK
    ``src/VectorTable.php`` builds its post_id foreign key against).
    The merge is a LEFT join so a contract-violating NULL id degrades
    VISIBLY (its row survives with NULL scrub columns) instead of
    silently vanishing; duplicate ids multiply (n x m rows per id) —
    which is why the join form is OPT-IN, not the default."""
    scrub = scrub_features(text_col)
    if fused:
        feats = quality_features(text_col)
        rep = repetition_features(text_col)
        toks = X.tokens(text_col)
        return docs.select(
            F.col(id_col),
            language_id(text_col).alias("lang_pred"),
            *[c.alias(n) for n, c in feats.items()],
            F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
            quality_score(text_col).alias("quality"),
            X.string_hash(text_col).alias("fingerprint"),
            X.ws_token_count(text_col).alias("ws_tokens"),
            F.size(X.bpe_pretokens(text_col)).cast("long").alias("bpe_tokens"),
            *[c.alias(n) for n, c in rep.items()],
            *[c.alias(n) for n, c in scrub.items()],
        )
    wide = _analyze_wide(docs, id_col, text_col)
    scrubbed = docs.select(
        F.col(id_col), *[c.alias(n) for n, c in scrub.items()]
    )
    return wide.join(scrubbed, id_col, "left")


def corpus_profile(
    docs: DataFrame,
    stratum_cols: tuple[str, ...] = ("lang", "source"),
    text_col: str = "text",
    lang_col: str = "lang",
    round_to: int = 6,
) -> DataFrame:
    """Corpus-level data profile — the "know your data" pass a training
    run starts from: per stratum (lang x source by default), document
    and token volumes, mean quality, PII incidence, and agreement
    between the heuristic language id and the label.

    Scale shape: TWO narrow aggregation passes (lambda features and the
    complex-regex PII probe in separate loops — see ``_profile_sums``),
    each a map-side-combinable hash aggregation keyed on the strata,
    merged by a union + re-sum over <= 2x#strata rows — output is
    #strata rows, never data-sized, and the corpus text never shuffles.

    Float discipline: mean quality goes through an INT-SCALED sum
    (floor(quality * 1e6) summed as BIGINT, divided back once) — a
    double sum's value depends on partition merge order, so the exact
    integer sum is what keeps the result deterministic and engine-
    portable (the DSIR log-ratio trick).  NULL text still scores — the
    quality formula's guards bottom out at the degenerate-text floor
    (0.39) in both engines, so NULL-text docs pull the mean toward it
    rather than vanishing; the ``_nq > 0`` guard only protects the
    impossible empty-group division."""
    return _profile_from_sums(
        _profile_sums(docs, stratum_cols, text_col, lang_col),
        stratum_cols,
        round_to,
    )


#: the integer state columns a profile reduces to — every one is a plain
#: long SUM (or a count, which is a sum of 1s), so partial profiles merge
#: EXACTLY by re-summing: sum(sum_batch_i) == sum(union) for integers,
#: the property the streaming profile's batch-equivalence rests on
PROFILE_SUM_COLS = (
    "n_docs",
    "total_chars",
    "total_tokens",
    "_nq",
    "_qsum",
    "n_pii_docs",
    "n_langid_agree",
)


def _profile_sums(
    docs: DataFrame,
    stratum_cols: tuple[str, ...],
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """The mergeable half of ``corpus_profile``: per-stratum INTEGER sums
    (PROFILE_SUM_COLS) from two narrow aggregation passes whose partial
    sums merge exactly (the same integer-sum property the streaming
    profile rests on).

    Two passes, not one, deliberately: the PII flag is a complex-regex
    probe, and a complex regex evaluated in the same projection loop as
    lambda-HOF siblings (the quality/langid features) runs ~10x slower
    than either does alone — additive in separate aggregates, 7x
    non-additive in one, whichever regex form was used (rlike, split,
    nested replaces, lambda-bound stages; mechanism consistent with
    JIT profile pollution of the shared interpreted-eval loop —
    measured in the round-7 scale sweep, PERFORMANCE.md item 51).  The
    merge is a second groupBy over <= 2x#strata rows: zero-padded
    union + re-sum, which unlike a join also keeps NULL-stratum groups
    (join equality would drop them)."""
    zero = F.lit(0).cast("long")
    lam = docs.select(
        *stratum_cols,
        F.length(text_col).cast("long").alias("_chars"),
        F.size(X.bpe_pretokens(text_col)).cast("long").alias("_bpe"),
        F.floor(quality_score(text_col) * F.lit(1000000.0))
        .cast("long")
        .alias("_q"),
        F.when(language_id(text_col) == F.col(lang_col), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("_agree"),
    ).groupBy(*stratum_cols).agg(
        F.count("*").alias("n_docs"),
        F.sum("_chars").alias("total_chars"),
        F.sum("_bpe").alias("total_tokens"),
        F.count("_q").alias("_nq"),
        F.sum("_q").alias("_qsum"),
        zero.alias("n_pii_docs"),
        F.sum("_agree").alias("n_langid_agree"),
    )
    rex = docs.select(
        *stratum_cols,
        F.when(pii_present(text_col), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("_pii"),
    ).groupBy(*stratum_cols).agg(
        zero.alias("n_docs"),
        zero.alias("total_chars"),
        zero.alias("total_tokens"),
        zero.alias("_nq"),
        zero.alias("_qsum"),
        F.sum("_pii").alias("n_pii_docs"),
        zero.alias("n_langid_agree"),
    )
    return (
        lam.unionByName(rex)
        .groupBy(*stratum_cols)
        .agg(*[F.sum(c).alias(c) for c in PROFILE_SUM_COLS])
    )


def _profile_from_sums(
    sums: DataFrame, stratum_cols: tuple[str, ...], round_to: int = 6
) -> DataFrame:
    """The presentation half: derive the ratio columns from the integer
    sums (one division each, identical order in every engine/path)."""
    return sums.select(
        *stratum_cols,
        "n_docs",
        "total_chars",
        "total_tokens",
        F.round(
            F.col("total_tokens").cast("double") / F.col("n_docs"), round_to
        ).alias("avg_tokens"),
        F.when(
            F.col("_nq") > 0,
            F.round(
                F.col("_qsum").cast("double") / F.lit(1000000.0) / F.col("_nq"),
                round_to,
            ),
        ).alias("avg_quality"),
        "n_pii_docs",
        "n_langid_agree",
    )


def sql_corpus_profile(
    stratum_cols: tuple[str, ...] = ("lang", "source"),
    table: str = "documents",
    text: str = "text",
    lang_col: str = "lang",
    round_to: int = 6,
) -> str:
    """DuckDB mirror of ``corpus_profile`` (same int-scaled quality sum
    and division order, so the doubles agree bit-for-bit)."""
    scrub = sql_scrub_features(text)
    strata = ", ".join(stratum_cols)
    q = sql_quality_score(text)
    bpe = X.sql_bpe_pretokens(text)
    pred = sql_language_id(text)
    return f"""
        WITH base AS (
          SELECT {strata},
                 CAST(length({text}) AS BIGINT) AS _chars,
                 CAST(len({bpe}) AS BIGINT) AS _bpe,
                 CAST(floor(({q}) * 1000000.0) AS BIGINT) AS _q,
                 CASE WHEN ({scrub['n_urls']}) + ({scrub['n_emails']})
                           + ({scrub['n_ips']}) > 0
                      THEN 1 ELSE 0 END AS _pii,
                 CASE WHEN ({pred}) = {lang_col} THEN 1 ELSE 0 END AS _agree
          FROM {table}
        )
        SELECT {strata},
               COUNT(*) AS n_docs,
               CAST(SUM(_chars) AS BIGINT) AS total_chars,
               CAST(SUM(_bpe) AS BIGINT) AS total_tokens,
               round(CAST(SUM(_bpe) AS DOUBLE) / COUNT(*), {round_to}) AS avg_tokens,
               CASE WHEN COUNT(_q) > 0 THEN
                 round(CAST(SUM(_q) AS DOUBLE) / 1000000.0 / COUNT(_q), {round_to})
               END AS avg_quality,
               CAST(SUM(_pii) AS BIGINT) AS n_pii_docs,
               CAST(SUM(_agree) AS BIGINT) AS n_langid_agree
        FROM base GROUP BY {strata}
    """


def unigram_logprob_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int = 6,
    persist: bool = True,
) -> DataFrame:
    """CCNet-style unigram language-model quality score: per document,
    the mean log-probability of its tokens under the CORPUS unigram
    distribution (Wenzek et al., CCNet, LREC'20 — their scorer is a
    5-gram KenLM; the unigram form is the join-expressible Spark-native
    analog and ranks documents the same way for the dominant
    frequent-vs-gibberish signal).  Low mean logprob = rare/garbled
    tokens; high = common fluent text.  Returns (id, n_tokens,
    mean_logprob).

    Scale shape: one token explode (narrow), one token-keyed count
    shuffle for the vocabulary (map-side combinable), one token-keyed
    join to score occurrences, one doc-keyed aggregation.  The LAST
    shuffle ships one rounded double per corpus token (collect_list
    partials concatenate, they do not combine) — the price of the
    deterministic sorted fold; swap the fold for a plain sum when
    cross-engine bit-stability is not needed.  No driver-side vocabulary
    (the LM "model" stays distributed, unlike a broadcast dictionary, so
    a 100M-type web vocab is fine).  ``persist=False`` skips caching the
    exploded token table (see pack_sequences' persist note) for
    many-corpora sessions.

    Determinism: per-token logprobs round to ``round_to`` FIRST (libm
    ``ln`` may differ across engines in the last ulp), then fold in
    value-sorted order — identical float addition sequence in any
    engine (see the dynamic-cardinality float-sum rule in SCALE.md).
    """
    toks = docs.select(
        F.col(id_col), F.explode(X.tokens(text_col)).alias("term")
    )
    if persist:
        # two consumers (vocab agg + score-join probe) would otherwise
        # re-tokenize and re-explode the whole corpus; lazy call-scoped
        # localCheckpoint barrier, GC-released — same shared-intermediate
        # rule as the minhash shingle table (round-10 verdict item 2:
        # .persist() here had no release handle)
        toks = call_barrier(toks)
    vocab = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    scored = toks.join(vocab, "term").crossJoin(F.broadcast(total)).select(
        F.col(id_col),
        F.round(
            F.log(F.col("cnt").cast("double") / F.col("total").cast("double")),
            round_to,
        ).alias("_lp"),
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list("_lp")),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / F.count("*"),
            round_to,
        ).alias("mean_logprob"),
    )


def sql_unigram_logprob_scores(corpus_sql: str, round_to: int = 6) -> str:
    """DuckDB mirror of ``unigram_logprob_scores`` over a (doc_id, text)
    relation: same per-token rounding, same value-sorted fold."""
    toks = X.sql_tokens("text")
    return f"""
        WITH corpus_u AS ({corpus_sql}),
        toksq AS (SELECT doc_id, unnest({toks}) AS term FROM corpus_u),
        vocab AS (SELECT term, COUNT(*) AS cnt FROM toksq GROUP BY term),
        tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM vocab),
        scored AS (
          SELECT doc_id,
                 round(ln(CAST(cnt AS DOUBLE) / total), {int(round_to)}) AS lp
          FROM toksq JOIN vocab USING (term), tot
        )
        SELECT doc_id, COUNT(*) AS n_tokens,
               round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                              list_sort(list(lp))),
                                 (a, b) -> a + b) / COUNT(*), {int(round_to)})
                 AS mean_logprob
        FROM scored GROUP BY doc_id
    """
