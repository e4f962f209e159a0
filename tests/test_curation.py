"""Curation operator tests: hash-threshold stratified sampling and
concat-and-chunk sequence packing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wpvectordb_spark.operators import curation as CU
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_id_hash_uniform_and_deterministic(spark):
    df = spark.range(0, 20000).select(CU.id_hash("id").alias("h"))
    frac = df.where(F.col("h") < int(0.3 * CU.HASH_RANGE)).count() / 20000
    assert 0.27 < frac < 0.33  # avalanche over sequential ids
    a = [r["h"] for r in df.limit(5).collect()]
    b = [r["h"] for r in spark.range(0, 5).select(CU.id_hash("id").alias("h")).collect()]
    assert a == b


def test_stratified_sample_fractions_and_monotonicity(docs):
    small = CU.stratified_sample(docs, {"en": 0.2}, default_fraction=0.0)
    big = CU.stratified_sample(docs, {"en": 0.6}, default_fraction=0.0)
    n_en = docs.where(F.col("lang") == "en").count()
    n_small, n_big = small.count(), big.count()
    assert 0.05 * n_en < n_small < 0.4 * n_en
    assert n_small < n_big
    # raising a fraction only ADDS rows (threshold filter is monotone)
    ids_small = {r["doc_id"] for r in small.select("doc_id").collect()}
    ids_big = {r["doc_id"] for r in big.select("doc_id").collect()}
    assert ids_small <= ids_big
    assert small.where(F.col("lang") != "en").count() == 0


def test_pack_sequences_invariants(docs):
    packed = CU.pack_sequences(docs, seq_len=512).collect()
    assert packed and all(r["seq_start"] <= r["seq_end"] for r in packed)
    by_lang: dict[str, list] = {}
    for r in packed:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rows:
            assert r["seq_start"] == cum // 512
            cum += r["n_tokens"]
            assert r["seq_end"] == (cum - 1) // 512
        # every sequence index up to the last is covered by some document
        covered = set()
        for r in rows:
            covered.update(range(r["seq_start"], r["seq_end"] + 1))
        assert covered == set(range((cum - 1) // 512 + 1))


def test_decontaminate_flags_holdout_copies(spark):
    """A corpus doc that IS a holdout doc shares all its shingles ->
    contaminated; disjoint text stays clean."""
    from pyspark.sql import functions as F

    from wpvectordb_spark.operators import curation as CU

    hold = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog again and again"),
            (101, "completely unrelated words about spark shuffles and parquet files"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in CU.decontaminate(corpus, hold, threshold=3).collect()}
    assert out[100]["contaminated"] == 1
    assert out[100]["n_matched"] == out[100]["n_shingles"]
    assert out[101]["contaminated"] == 0
    assert out[101]["n_matched"] == 0


def test_decontaminate_plan_broadcasts_holdout(spark):
    """The holdout shingle set must reach the corpus join as a broadcast —
    no shuffle of the corpus side on the shingle hash."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR
    from wpvectordb_spark.operators import curation as CU

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = CU.decontaminate(
        docs.where(F.col("doc_id") >= 20), docs.where(F.col("doc_id") < 20)
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_decontaminate_shuffle_mode_matches_broadcast(spark):
    """broadcast_holdout=False (the too-big-to-broadcast cross-corpus
    form) must produce identical rows through a shuffle join — and the
    plan must actually shuffle instead of broadcasting."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR
    from wpvectordb_spark.operators import curation as CU

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus, hold = docs.where(F.col("doc_id") >= 20), docs.where(F.col("doc_id") < 20)
    bcast = CU.decontaminate(corpus, hold, threshold=5)
    shuf = CU.decontaminate(corpus, hold, threshold=5, broadcast_holdout=False)
    assert sorted(map(tuple, bcast.collect())) == sorted(map(tuple, shuf.collect()))
    plan = shuf._jdf.queryExecution().executedPlan().toString()
    # the holdout-membership join (on the shingle hash `h`) must be the
    # shuffle form; the final n_matched left-join on doc_id may still
    # broadcast — that side is one row per corpus doc, not the holdout
    h_joins = [ln for ln in plan.splitlines() if "Join [h#" in ln]
    assert h_joins, plan
    assert all("Broadcast" not in ln for ln in h_joins), h_joins
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan, plan


def test_decontaminate_threshold_monotone(spark):
    """Raising the threshold can only shrink the contaminated set, and
    n_matched is invariant to the threshold."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR
    from wpvectordb_spark.operators import curation as CU

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus, hold = docs.where(F.col("doc_id") >= 20), docs.where(F.col("doc_id") < 20)
    by_thr = {}
    matched = {}
    for thr in (1, 5, 50):
        rows = {r["doc_id"]: r for r in CU.decontaminate(corpus, hold, threshold=thr).collect()}
        by_thr[thr] = {d for d, r in rows.items() if r["contaminated"]}
        matched[thr] = {d: r["n_matched"] for d, r in rows.items()}
    assert by_thr[50] <= by_thr[5] <= by_thr[1]
    assert matched[1] == matched[5] == matched[50]
    # every corpus doc gets a row, contaminated or not
    assert len(matched[1]) == corpus.count()


def test_shuffle_shard_is_a_permutation(docs):
    out = CU.shuffle_shard(docs, num_shards=8, seed=42).collect()
    n = docs.count()
    assert len(out) == n
    # every shard's positions are exactly 1..len(shard) (no gaps/dups)
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(8))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # hash spreads rows across all shards reasonably (no empty shard at
    # 500 rows / 8 shards, and no shard hogging > 2x the mean)
    sizes = [len(v) for v in by_shard.values()]
    assert len(sizes) == 8 and max(sizes) < 2 * (n / 8)


def test_shuffle_shard_deterministic_and_seed_sensitive(docs):
    a = sorted(map(tuple, CU.shuffle_shard(docs, 8, seed=42).collect()))
    b = sorted(map(tuple, CU.shuffle_shard(docs, 8, seed=42).collect()))
    c = sorted(map(tuple, CU.shuffle_shard(docs, 8, seed=7).collect()))
    assert a == b  # reproducible epoch order
    assert a != c  # seed actually changes the order


def test_shuffle_shard_order_is_shuffled(docs):
    """Within a shard, hash order must not degenerate to id order."""
    rows = CU.shuffle_shard(docs, num_shards=1, seed=0).collect()
    ids_by_pos = [r["doc_id"] for r in sorted(rows, key=lambda r: r["pos"])]
    assert ids_by_pos != sorted(ids_by_pos)


def test_budget_sample_hits_token_budget(docs):
    from wpvectordb_spark.functions import text as X

    totals = {
        r["lang"]: r["tot"]
        for r in docs.select(
            "lang", F.size(X.bpe_pretokens("text")).cast("long").alias("n")
        )
        .groupBy("lang")
        .agg(F.sum("n").alias("tot"))
        .collect()
    }
    budgets = {"en": 5000, "de": 2000}
    out = CU.budget_sample(docs, budgets).collect()
    by_lang: dict[str, int] = {}
    for r in out:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + r["n_tokens"]
    # only budgeted strata survive
    assert set(by_lang) <= set(budgets)
    # kept token mass tracks min(budget, stratum total) — exact in
    # expectation only; ±45% tolerance for a few-hundred-doc corpus
    for lang, budget in budgets.items():
        if lang not in totals:
            continue
        expect = min(budget, totals[lang])
        got = by_lang.get(lang, 0)
        if expect == totals[lang]:
            assert got == expect, (lang, got, expect)  # budget >= total: keep all
        else:
            assert 0.55 * expect <= got <= 1.45 * expect, (lang, got, expect)


def test_temperature_budgets_alpha_extremes(docs):
    """alpha=1 reproduces natural proportions; alpha=0 splits the budget
    uniformly across strata (floor rounding aside)."""
    from wpvectordb_spark.functions import text as X

    totals = {
        r["lang"]: r["tot"]
        for r in docs.select(
            "lang", F.size(X.bpe_pretokens("text")).cast("long").alias("n")
        )
        .groupBy("lang")
        .agg(F.sum("n").alias("tot"))
        .collect()
        if r["lang"] is not None
    }
    total = sum(totals.values())
    nat = CU.temperature_budgets(docs, total_budget=100_000, alpha=1.0)
    assert set(nat) == set(totals)
    for s in totals:
        assert abs(nat[s] - 100_000 * totals[s] / total) <= 1
    uni = CU.temperature_budgets(docs, total_budget=100_000, alpha=0.0)
    assert max(uni.values()) - min(uni.values()) <= 1


def test_temperature_budgets_upweights_low_resource(docs):
    """At alpha<1 every stratum's share moves toward uniform: the
    smallest stratum's share strictly grows vs natural, the largest
    strictly shrinks, and the size ORDER is preserved."""
    nat = CU.temperature_budgets(docs, total_budget=1_000_000, alpha=1.0)
    t03 = CU.temperature_budgets(docs, total_budget=1_000_000, alpha=0.3)
    assert set(nat) == set(t03)
    smallest = min(nat, key=nat.get)
    largest = max(nat, key=nat.get)
    assert t03[smallest] > nat[smallest]
    assert t03[largest] < nat[largest]
    order_nat = sorted(nat, key=nat.get)
    order_t03 = sorted(t03, key=t03.get)
    assert order_nat == order_t03


def test_temperature_budgets_compose_with_budget_sample(docs):
    """The computed budgets drive budget_sample end to end: kept token
    mass per stratum lands at or under its budget (hash-threshold
    fractions under-shoot only stochastically, never over-shoot by more
    than one doc's tokens in expectation — assert the clipped bound)."""
    budgets = CU.temperature_budgets(docs, total_budget=4000, alpha=0.5)
    assert budgets
    out = CU.budget_sample(docs, budgets).collect()
    by_lang: dict[str, int] = {}
    for r in out:
        by_lang[r["lang"]] = by_lang.get(r["lang"], 0) + r["n_tokens"]
    # deterministic: second run identical
    out2 = CU.budget_sample(docs, budgets).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))
    assert set(by_lang) <= set(budgets)


def test_temperature_budgets_rejects_bad_alpha(docs):
    with pytest.raises(ValueError, match="alpha"):
        CU.temperature_budgets(docs, total_budget=1000, alpha=1.5)
    with pytest.raises(ValueError, match="alpha"):
        CU.temperature_budgets_frame(docs, total_budget=1000, alpha=-0.1)


def test_temperature_budgets_frame_matches_dict(docs):
    """The frame form is the dict form as a query: same strata, same
    integer budgets (identical pow/fold/round-floor arithmetic), plus
    the normalized ratio column summing to ~1 and never exceeding the
    budget invariant sum(budgets) <= total_budget."""
    budgets = CU.temperature_budgets(docs, total_budget=10_000, alpha=0.3)
    rows = CU.temperature_budgets_frame(docs, total_budget=10_000, alpha=0.3).collect()
    assert {r["stratum"]: r["budget"] for r in rows} == budgets
    assert sum(budgets.values()) <= 10_000
    assert abs(sum(r["ratio"] for r in rows) - 1.0) < 1e-6
    for r in rows:
        assert r["total_tokens"] > 0


WF_SCHEMA = "stratum string, weight long, capacity long"
WF_STRATA = [("a", 1, 10), ("b", 1, 100), ("c", 2, 100)]


def _wf_spark(spark, rows, budget):
    df = spark.createDataFrame(rows, WF_SCHEMA)
    out = CU.waterfill_budgets_frame(df, budget).collect()
    return {r["stratum"]: (r["allocated"], r["saturated"]) for r in out}


def test_waterfill_known_answer(spark):
    """Hand-derived: r = cap/w gives a=10, c=50, b=100; at B=120 only a
    saturates (frontier predicate 10*3 <= 110*1), the remaining 110
    spreads over weights {b:1, c:2}."""
    got = _wf_spark(spark, WF_STRATA, 120)
    assert got == {"a": (10, 1), "b": (36, 0), "c": (73, 0)}
    assert sum(v[0] for v in got.values()) <= 120


def test_waterfill_boundary_and_extremes(spark):
    # B exactly at a's saturation boundary (equality in the predicate)
    assert _wf_spark(spark, WF_STRATA, 40) == {
        "a": (10, 1), "b": (10, 0), "c": (20, 0)
    }
    # nothing saturates: pure proportional floor split
    assert _wf_spark(spark, WF_STRATA, 30) == {
        "a": (7, 0), "b": (7, 0), "c": (15, 0)
    }
    # budget >= total capacity: everyone gets their capacity
    assert _wf_spark(spark, WF_STRATA, 10**9) == {
        "a": (10, 1), "b": (100, 1), "c": (100, 1)
    }
    # zero budget: zero allocations, nothing saturated
    assert _wf_spark(spark, WF_STRATA, 0) == {
        "a": (0, 0), "b": (0, 0), "c": (0, 0)
    }


def test_waterfill_excludes_degenerate_rows_and_rejects_negative(spark):
    rows = WF_STRATA + [("z", 0, 50), ("y", 3, 0), ("x", -1, 50)]
    got = _wf_spark(spark, rows, 120)
    assert set(got) == {"a", "b", "c"}
    with pytest.raises(ValueError, match="negative"):
        CU.waterfill_budgets_frame(
            spark.createDataFrame(WF_STRATA, WF_SCHEMA), -1
        )
    # empty strata frame: empty result, no error
    empty = spark.createDataFrame([], WF_SCHEMA)
    assert CU.waterfill_budgets_frame(empty, 100).collect() == []


def test_waterfill_dict_matches_frame(spark):
    df = spark.createDataFrame(WF_STRATA, WF_SCHEMA)
    assert CU.waterfill_budgets(df, 120) == {"a": 10, "b": 36, "c": 73}


def test_waterfill_duckdb_parity(spark, duck):
    """Cross-engine parity including a cap/weight RATIO TIE (d and e):
    the tie breaks on the stratum key identically in both engines, and
    the all-integer frontier predicate leaves no room for float drift."""
    rows = WF_STRATA + [("d", 2, 40), ("e", 1, 20), ("f", 5, 9)]
    for budget in (0, 9, 40, 77, 120, 500):
        sdf = CU.waterfill_budgets_frame(
            spark.createDataFrame(rows, WF_SCHEMA), budget
        )
        vals = ", ".join(f"('{s}', {w}, {c})" for s, w, c in rows)
        rel = duck.sql(
            CU.sql_waterfill_budgets(
                f"SELECT * FROM (VALUES {vals}) t(stratum, weight, capacity)",
                budget,
            )
        )
        from tests.conftest import assert_parity

        assert_parity(sdf, rel)


def test_waterfill_fractional_inputs_cross_engine(spark, duck):
    """Out-of-contract DOUBLE weights/capacities must still agree across
    engines: both truncate-then-filter (a bare DuckDB CAST would ROUND
    0.6 -> 1 while Spark's cast truncates — review finding, round 7)."""
    from tests.conftest import assert_parity

    rows = [("a", 0.6, 0.4), ("b", 1.9, 10.2), ("c", 2.0, 7.999)]
    sdf = CU.waterfill_budgets_frame(
        spark.createDataFrame(rows, "stratum string, weight double, capacity double"),
        9,
    )
    vals = ", ".join(f"('{s}', {w}, {c})" for s, w, c in rows)
    rel = duck.sql(
        CU.sql_waterfill_budgets(
            f"SELECT * FROM (VALUES {vals}) t(stratum, weight, capacity)", 9
        )
    )
    assert_parity(sdf, rel)
    # row 'a' truncates to (0, 0) and must be excluded in BOTH engines
    assert {r["stratum"] for r in sdf.collect()} == {"b", "c"}


def _ref_waterfill(rows, b):
    """Transparent O(n^2)-ish Python waterfill: rank by cap/w ascending
    (ties by key), grow the saturated prefix while the integer frontier
    predicate holds, floor-div the remainder."""
    srt = sorted(rows, key=lambda r: (r[2] / r[1], r[0]))
    tw = sum(r[1] for r in srt)
    ccap = cw = jcap = jw = 0
    jstar = 0
    for j, (_, w, cap) in enumerate(srt, 1):
        ccap, cw = ccap + cap, cw + w
        if cap * (tw - cw) <= (b - ccap) * w:
            jstar, jcap, jw = j, ccap, cw
    out = {}
    for j, (k, w, cap) in enumerate(srt, 1):
        if j <= jstar:
            out[k] = cap
        else:
            out[k] = min(cap, (b - jcap) * w // max(tw - jw, 1))
    return out


def test_waterfill_hypothesis_matches_reference(spark):
    """Property sweep: random strata sets and budgets, Spark allocation
    must equal the Python reference exactly, plus the structural
    invariants (alloc <= cap; saturated <=> alloc == cap at frontier;
    total within #strata of min(B, sum cap))."""
    from hypothesis import given, settings, strategies as st

    strata_sets = st.lists(
        st.tuples(st.integers(1, 50), st.integers(1, 1000)),
        min_size=1,
        max_size=12,
    )

    @settings(max_examples=12, deadline=None)
    @given(strata_sets, st.integers(0, 4000))
    def prop(pairs, budget):
        rows = [(f"s{i:02d}", w, c) for i, (w, c) in enumerate(pairs)]
        got = _wf_spark(spark, rows, budget)
        ref = _ref_waterfill(rows, budget)
        assert {k: v[0] for k, v in got.items()} == ref
        total_cap = sum(c for _, _, c in rows)
        allocated = sum(v[0] for v in got.values())
        assert allocated <= min(budget, total_cap)
        # floor loss: < 1 token per unsaturated stratum
        assert min(budget, total_cap) - allocated < max(len(rows), 1)
        for (k, w, c) in rows:
            alloc, sat = got[k]
            assert 0 <= alloc <= c
            if sat:
                assert alloc == c

    prop()


def test_waterfill_invariants_against_reference_impl(spark):
    """Fixed pseudorandom strata set vs the reference impl (the
    hypothesis sweep above covers random shapes; this pins one larger
    23-stratum case deterministically)."""
    import hashlib

    rows = []
    for i in range(23):
        h = hashlib.sha256(f"wf{i}".encode()).digest()
        rows.append((f"s{i:02d}", 1 + h[0] % 7, 5 + h[1] * 3))
    budget = 900
    got = {k: v[0] for k, v in _wf_spark(spark, rows, budget).items()}
    assert got == _ref_waterfill(rows, budget)
    assert sum(got.values()) <= budget


def test_waterfill_arm_non_vacuous_at_oracle_scale(spark):
    """The registry's wf arm must exercise BOTH branches (a saturated
    stratum and proportionally-filled ones) at the oracle scale, else
    the hash match verifies only one code path — the same corpus-tuned
    guard as the gopher thresholds.  seq_start carries the saturated
    flag, shard the allocation (tagged-union column reuse)."""
    import __spark_entry__ as E
    from tests.conftest import SF_DIR as sf

    rows = (
        E.queries()["curate_sample_pack"](spark, sf)
        .where(F.col("kind") == "wf")
        .collect()
    )
    assert {r["seq_start"] for r in rows} == {0, 1}
    assert sum(r["shard"] for r in rows) <= E.WF_BUDGET
    for r in rows:
        assert 0 <= r["shard"] <= r["n_tokens"]


def test_contamination_report_golden(spark):
    """Hand-built corpus: holdout doc h1's 6-token run appears verbatim
    in two corpus documents (4 shared 3-shingles each), h2 shares
    nothing, h3 is a verbatim copy of one corpus doc."""
    schema = "doc_id long, text string"
    corpus = spark.createDataFrame(
        [
            (101, "alpha beta gamma delta epsilon zeta unrelated tail"),
            (102, "prefix words alpha beta gamma delta epsilon zeta"),
            (103, "completely different content here nothing shared"),
            (104, "the quick brown fox jumps over the lazy dog"),
        ],
        schema,
    )
    holdout = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "no overlap with anything in that corpus at all"),
            (3, "the quick brown fox jumps over the lazy dog"),
        ],
        schema,
    )
    rows = {
        r["holdout_id"]: r
        for r in CU.contamination_report(corpus, holdout, threshold=3).collect()
    }
    # h1: 4 distinct 3-shingles, all present in corpus docs 101 and 102
    assert rows[1]["n_shingles"] == 4
    assert rows[1]["n_matched_docs"] == 2
    assert rows[1]["worst_overlap"] == 4
    assert rows[1]["leaked"] == 1
    # h2: present in output, zero-filled
    assert rows[2]["n_matched_docs"] == 0
    assert rows[2]["worst_overlap"] == 0
    assert rows[2]["leaked"] == 0
    # h3: verbatim copy of 104 — worst_overlap = its full shingle count
    assert rows[3]["worst_overlap"] == rows[3]["n_shingles"]
    assert rows[3]["n_matched_docs"] == 1


def test_contamination_report_shingle_df_cap(spark):
    """A boilerplate shingle present in many corpus docs is dropped by
    max_shingle_df BEFORE the join: overlaps that rode only on the
    boilerplate disappear, genuine overlaps survive."""
    schema = "doc_id long, text string"
    boiler = "click here to subscribe"
    corpus = spark.createDataFrame(
        [(i, f"document number {i} content. {boiler}") for i in range(100, 120)]
        + [(200, "genuine rare overlap marker phrase body")],
        schema,
    )
    holdout = spark.createDataFrame(
        [
            (1, f"an eval question. {boiler}"),
            (2, "genuine rare overlap marker phrase body"),
        ],
        schema,
    )
    uncapped = {
        r["holdout_id"]: r["n_matched_docs"]
        for r in CU.contamination_report(corpus, holdout, threshold=2).collect()
    }
    capped = {
        r["holdout_id"]: r["n_matched_docs"]
        for r in CU.contamination_report(
            corpus, holdout, threshold=2, max_shingle_df=5
        ).collect()
    }
    assert uncapped[1] > 0  # boilerplate alone fakes leakage
    assert capped[1] == 0  # the cap removes the hot shingle
    assert capped[2] == 1  # the genuine overlap survives (df=1)


def test_contamination_report_duckdb_parity(spark, duck, docs):
    from tests.conftest import assert_parity

    sdf = CU.contamination_report(
        docs.where(F.col("doc_id") >= 20),
        docs.where(F.col("doc_id") < 20),
        threshold=3,
    )
    assert_parity(sdf, duck.sql(CU.sql_contamination_report(threshold=3)))


def test_contamination_report_df_cap_single_corpus_pass(spark):
    """The DF cap must NOT re-run the corpus shingle fold: the capped
    plan scans the documents source exactly as often as the uncapped
    one (a groupBy+self-join formulation doubles the dominant fold
    cost — review finding, round 7)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus, holdout = docs.where("doc_id >= 20"), docs.where("doc_id < 20")

    def n_scans(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("FileScan parquet")

    uncapped = n_scans(CU.contamination_report(corpus, holdout, threshold=3))
    capped = n_scans(
        CU.contamination_report(corpus, holdout, threshold=3, max_shingle_df=50)
    )
    # corpus once; the HOLDOUT side is read twice by design (explode +
    # the zero-fill base join) — it is eval-sized, the cheap side
    assert capped == uncapped == 3


def test_contamination_report_empty_inputs(spark):
    schema = "doc_id long, text string"
    empty = spark.createDataFrame([], schema)
    some = spark.createDataFrame([(1, "a b c d e")], schema)
    # empty holdout -> empty report; empty corpus -> zero-filled holdout
    assert CU.contamination_report(some, empty).collect() == []
    rows = CU.contamination_report(empty, some).collect()
    assert len(rows) == 1 and rows[0]["n_matched_docs"] == 0
    # NULL text rides through with NULL n_shingles, zero matches
    nulls = spark.createDataFrame([(9, None)], schema)
    r = CU.contamination_report(some, nulls).collect()[0]
    assert r["n_shingles"] is None and r["leaked"] == 0


def test_budget_sample_full_budget_keeps_everything(docs):
    huge = CU.budget_sample(docs, {"en": 10**9})
    n_en = docs.where(F.col("lang") == 'en').count()
    assert huge.count() == n_en


def test_budget_sample_monotone_in_budget(docs):
    small = {r["doc_id"] for r in CU.budget_sample(docs, {"en": 5000}).collect()}
    big = {r["doc_id"] for r in CU.budget_sample(docs, {"en": 15000}).collect()}
    assert small <= big


def test_quality_quantile_filter_per_stratum(docs):
    from wpvectordb_spark.operators import text_analysis as TA

    scored = docs.select("doc_id", "lang", TA.quality_score("text").alias("quality"))
    kept = CU.quality_quantile_filter(scored, quantile=0.25)
    # roughly the top 75% of each language survives
    for lang, total in [(r["lang"], r["cnt"]) for r in
                        scored.groupBy("lang").agg(F.count("*").alias("cnt")).collect()]:
        k = kept.where(F.col("lang") == lang).count()
        assert k >= 0.70 * total and k <= total, (lang, k, total)
    # and each language's kept minimum >= its dropped maximum is NOT
    # required (ties), but kept min must be >= the stratum cutoff
    cuts = {
        r["lang"]: r["cut"]
        for r in scored.groupBy("lang").agg(F.expr("percentile(quality, 0.25)").alias("cut")).collect()
    }
    mins = {
        r["lang"]: r["mn"]
        for r in kept.groupBy("lang").agg(F.min("quality").alias("mn")).collect()
    }
    for lang in mins:
        assert mins[lang] >= cuts[lang]

def test_remove_boilerplate_lines(spark):
    rows = [
        (1, "unique one\nCOOKIE BANNER\nbody of doc one"),
        (2, "COOKIE BANNER\nanother body\nNAV BAR"),
        (3, "NAV BAR\nCOOKIE BANNER"),
        (4, "totally original\ntext here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in CU.remove_boilerplate_lines(docs, min_docs=2).collect()}
    # shared lines stripped everywhere, order preserved
    assert out[1]["text"] == "unique one\nbody of doc one"
    assert out[2]["text"] == "another body"
    assert out[4]["text"] == "totally original\ntext here"
    # doc 3 was pure boilerplate: survives as empty with full removal count
    assert out[3]["text"] == "" and out[3]["n_removed"] == 2
    assert out[1]["n_removed"] == 1 and out[4]["n_removed"] == 0


def test_remove_boilerplate_lines_custom_segmentation(spark):
    rows = [(1, "a\nb\nc"), (2, "b\nd")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    lines = docs.select(
        "doc_id", F.posexplode(F.split("text", "\n", -1)).alias("pos", "line")
    )
    via_delim = {tuple(r) for r in CU.remove_boilerplate_lines(docs, min_docs=2).collect()}
    via_lines = {tuple(r) for r in CU.remove_boilerplate_lines(lines=lines, min_docs=2).collect()}
    assert via_lines == via_delim
    assert ("1", ) != ()  # sanity


def test_remove_boilerplate_shuffled_fallback_identical(spark):
    """With a heavy set too large to broadcast (simulated by disabling
    auto-broadcast so the anti-join runs shuffled), results are identical
    to the broadcast path — the guard degrades, never corrupts."""
    # 50 docs x 20 shared "boilerplate" lines each + one unique line
    rows = [
        (i, "\n".join([f"shared line {j}" for j in range(20)] + [f"unique {i}"]))
        for i in range(50)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    forced = {
        tuple(r)
        for r in CU.remove_boilerplate_lines(
            docs, min_docs=2, force_broadcast=True
        ).collect()
    }
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        shuffled = {
            tuple(r) for r in CU.remove_boilerplate_lines(docs, min_docs=2).collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert shuffled == forced
    assert all(t[1] == f"unique {t[0]}" and t[2] == 20 for t in shuffled)


def test_remove_boilerplate_within_doc_repeat_not_boilerplate(spark):
    # a line repeated INSIDE one doc is not boilerplate (distinct-doc count)
    rows = [(1, "echo\necho\nkeep"), (2, "other")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in CU.remove_boilerplate_lines(docs, min_docs=2).collect()}
    assert out[1]["text"] == "echo\necho\nkeep" and out[1]["n_removed"] == 0


def test_chunk_documents_basic(spark):
    # 10 tokens, chunk 4, overlap 1 -> stride 3 -> starts 0,3,6 (9 >= max(10-1,1)=9 stops)
    docs = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")], ["doc_id", "text"]
    )
    out = sorted(
        CU.chunk_documents(docs, chunk_tokens=4, overlap=1).collect(),
        key=lambda r: r["pos"],
    )
    assert [(r["seq_start"], r["seq_end"]) for r in out] == [(0, 4), (3, 7), (6, 10)]
    assert out[0]["chunk_text"] == "t0 t1 t2 t3"
    assert out[1]["chunk_text"] == "t3 t4 t5 t6"
    assert out[2]["chunk_text"] == "t6 t7 t8 t9"
    # consecutive chunks overlap by exactly `overlap` tokens
    assert all(r["n_tokens"] == r["seq_end"] - r["seq_start"] for r in out)


def test_chunk_documents_edges(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b"),  # shorter than one chunk -> single short chunk
            (2, ""),  # empty -> no chunks
            (3, None),  # null -> no chunks
            (4, " ".join(f"w{i}" for i in range(33))),  # one token past a boundary
        ],
        "doc_id long, text string",
    )
    out = CU.chunk_documents(docs, chunk_tokens=32, overlap=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 4}
    assert [(r["seq_start"], r["seq_end"]) for r in by_doc[1]] == [(0, 2)]
    # 33 tokens, stride 24: starts 0 and 24 (24 < max(33-8,1)=25)
    assert sorted((r["seq_start"], r["seq_end"]) for r in by_doc[4]) == [(0, 32), (24, 33)]


def test_chunk_documents_covers_every_token(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
    chunks = CU.chunk_documents(docs, chunk_tokens=32, overlap=8, with_text=False)
    from wpvectordb_spark.functions import text as X

    n_tok = docs.select(
        "doc_id", F.coalesce(F.size(X.tokens("text")), F.lit(0)).alias("n")
    )
    agg = (
        chunks.groupBy("doc_id")
        .agg(F.min("seq_start").alias("lo"), F.max("seq_end").alias("hi"))
        .join(n_tok, "doc_id")
    )
    bad = agg.where((F.col("lo") != 0) | (F.col("hi") != F.col("n"))).count()
    assert bad == 0


def test_cap_per_domain_exact_and_deterministic(spark):
    """Per-domain cap keeps exactly min(cap, |domain|) docs, selected by
    the seeded Wang-hash order — cross-checked against a pure-Python
    reimplementation of the hash and selection."""

    def py_hash(i, seed=0):
        h = (i + seed * 2654435761) % (1 << 32)
        for _ in range(2):
            h = (((h >> 16) ^ h) * 0x45D9F3B) % (1 << 32)
        return (h >> 16) ^ h

    rows = [(i, "big") for i in range(100)] + [(1000 + i, "small") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = CU.cap_per_domain(docs, max_docs=10).collect()
    got = {(r["doc_id"], r["domain"], r["rank"]) for r in out}
    expected = set()
    for dom, ids in (("big", range(100)), ("small", [1000, 1001, 1002])):
        ranked = sorted(ids, key=lambda i: (py_hash(i), i))[:10]
        expected |= {(i, dom, k + 1) for k, i in enumerate(ranked)}
    assert got == expected
    assert len([t for t in got if t[1] == "big"]) == 10
    assert len([t for t in got if t[1] == "small"]) == 3  # under cap: all kept
    # deterministic across runs
    again = {(r["doc_id"], r["domain"], r["rank"]) for r in CU.cap_per_domain(docs, max_docs=10).collect()}
    assert again == got


def test_cap_per_domain_keeps_null_domain_docs(spark):
    """Domain-less documents form one more (capped) domain — a plain
    equi-join on the domain key would never match the NULL count group
    and silently delete every such doc from the kept manifest."""
    rows = [(1, "a"), (2, "a"), (3, None), (4, None), (5, "b")]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = {(r["doc_id"], r["domain"]) for r in CU.cap_per_domain(docs, 10).collect()}
    assert out == {(1, "a"), (2, "a"), (3, None), (4, None), (5, "b")}
    capped = CU.cap_per_domain(docs, 1).collect()
    assert sum(1 for r in capped if r["domain"] is None) == 1  # cap applies too


def test_cap_per_domain_monotone_in_cap(spark):
    """Raising the cap only ADDS documents (hash-order selection is a
    prefix property), and ranks of surviving docs are stable."""
    rows = [(i, f"src{i % 3}") for i in range(120)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    small = {(r["doc_id"], r["domain"], r["rank"]) for r in CU.cap_per_domain(docs, 5).collect()}
    big = {(r["doc_id"], r["domain"], r["rank"]) for r in CU.cap_per_domain(docs, 10).collect()}
    assert small <= big
    assert len(small) == 15 and len(big) == 30


def test_dsir_topk_enriches_target_distribution(docs):
    """Selecting toward the English subset must (a) rank mostly English
    docs into the top-k (strongly above the base rate), (b) be
    deterministic, and (c) emit exactly k rows with finite weights."""
    corpus = docs.select("doc_id", "text")
    target = docs.where(F.col("lang") == "en").select("doc_id", "text")
    out = CU.dsir_topk(corpus, target, k=50)
    rows = out.collect()
    assert len(rows) == 50
    assert all(r["weight"] == r["weight"] for r in rows)  # no NaN
    picked = {r["doc_id"] for r in rows}
    en = {r["doc_id"] for r in docs.where(F.col("lang") == "en").collect()}
    base_rate = len(en) / docs.count()
    hit_rate = len(picked & en) / 50
    assert hit_rate > min(0.8, base_rate + 0.3), (hit_rate, base_rate)
    again = {r["doc_id"] for r in CU.dsir_topk(corpus, target, k=50).collect()}
    assert picked == again


def test_dsir_weights_order_by_target_likeness(spark):
    """A doc made of target-only n-grams outweighs a doc of corpus-only
    n-grams under the fitted models."""
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta"), (3, "alpha beta gamma")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(10, "alpha beta gamma alpha beta")], "doc_id long, text string"
    )
    w = {r["doc_id"]: r["weight"] for r in CU.dsir_topk(corpus, target, k=3).collect()}
    assert w[1] == w[3]  # identical docs, identical weights
    assert w[1] > w[2]  # target-like beats target-unlike


def test_dsir_score_all_mode(docs):
    """k=None returns the full weight table (every doc with features)."""
    corpus = docs.where(F.col("doc_id") < 100).select("doc_id", "text")
    target = docs.where((F.col("lang") == "en") & (F.col("doc_id") < 100)).select(
        "doc_id", "text"
    )
    out = CU.dsir_topk(corpus, target, k=None)
    assert out.count() == 100
    assert set(out.columns) == {"doc_id", "n_feats", "weight"}


def test_dsir_gumbel_sample_properties(docs):
    """Seeded Gumbel-top-k: deterministic per seed, seed-sensitive, and
    degenerates to the plain top-k as temperature -> 0."""
    corpus = docs.select("doc_id", "text")
    target = docs.where(F.col("lang") == "en").select("doc_id", "text")
    w = CU.dsir_topk(corpus, target, k=None).persist()
    s0 = {r["doc_id"] for r in CU.dsir_gumbel_sample(w, k=50, seed=0).collect()}
    s0b = {r["doc_id"] for r in CU.dsir_gumbel_sample(w, k=50, seed=0).collect()}
    s1 = {r["doc_id"] for r in CU.dsir_gumbel_sample(w, k=50, seed=1).collect()}
    assert s0 == s0b and s0 != s1
    cold = {
        r["doc_id"]
        for r in CU.dsir_gumbel_sample(w, k=50, temperature=1e-12).collect()
    }
    plain = {r["doc_id"] for r in CU.dsir_topk(corpus, target, k=50).collect()}
    assert cold == plain
    # string ids: the documented input is dsir_topk(k=None), which is
    # id-type agnostic — the sampler's hash must be too (the integer
    # id_hash failed under ANSI / silently NULLed without it)
    ws = w.withColumn("doc_id", F.concat(F.lit("doc-"), F.col("doc_id")))
    str0 = {r["doc_id"] for r in CU.dsir_gumbel_sample(ws, k=50, seed=0).collect()}
    str0b = {r["doc_id"] for r in CU.dsir_gumbel_sample(ws, k=50, seed=0).collect()}
    str1 = {r["doc_id"] for r in CU.dsir_gumbel_sample(ws, k=50, seed=1).collect()}
    assert len(str0) == 50 and str0 == str0b and str0 != str1


C4_FIXTURE = [
    (1, "This line ends properly.\nshort.\nno terminal punct here\n"
        "Another good sentence stays!\nIs this kept?\nfinal line with javascript stays out."),
    (2, "Only one good sentence here.\nrest are fragments\nno"),
    (3, "Lorem ipsum dolor sit amet.\nA fine sentence indeed.\nAnother fine sentence here.\nAnd one more to clear the bar."),
    (4, "function() { return 1; }\nA fine sentence indeed.\nAnother fine sentence here.\nAnd one more to clear the bar."),
    (5, "First proper sentence right here.\nSecond proper sentence as well.\nThird proper sentence closes it."),
    (6, ""),
    (7, None),
]


def test_c4_page_filter_rules(spark):
    """Line rules: terminal punctuation + min words + no 'javascript';
    page rules: >= min_kept_lines kept lines, no lorem ipsum, no brace."""
    df = spark.createDataFrame(C4_FIXTURE, "doc_id long, text string")
    got = {r["doc_id"]: r for r in CU.c4_page_filter(df, min_words=3, min_kept_lines=3).collect()}
    assert got[1]["n_lines"] == 6 and got[1]["n_kept"] == 3  # short./fragment/javascript dropped
    assert got[1]["page_kept"] == 1
    assert got[1]["text"] == (
        "This line ends properly.\nAnother good sentence stays!\nIs this kept?"
    )
    assert got[2]["page_kept"] == 0  # only 1 kept line
    assert got[3]["page_kept"] == 0  # lorem ipsum page rule
    assert got[4]["page_kept"] == 0  # curly-brace page rule
    assert got[5]["page_kept"] == 1 and got[5]["n_kept"] == 3
    for d in (6, 7):  # empty and NULL text behave identically
        assert got[d]["n_lines"] == 0 and got[d]["page_kept"] == 0 and got[d]["text"] == ""


def test_c4_page_filter_cross_engine_parity(spark, duck):
    df = spark.createDataFrame(C4_FIXTURE, "doc_id long, text string")
    s = sorted(map(tuple, CU.c4_page_filter(df).collect()), key=repr)
    vals = ", ".join(
        ("(%d, '%s')" % (i, t.replace("'", "''").replace("\n", "' || chr(10) || '")))
        if t is not None else "(%d, NULL)" % i
        for i, t in C4_FIXTURE
    )
    duck.execute(f"CREATE OR REPLACE TABLE c4fix AS SELECT * FROM (VALUES {vals}) t(doc_id, text)")
    d = sorted(
        duck.sql(CU.sql_c4_page_filter("SELECT doc_id, text FROM c4fix")).fetchall(),
        key=repr,
    )
    assert s == d


def test_temperature_budgets_null_and_zero_strata(spark):
    """Strata with NULL or zero token mass drop instead of crashing the
    driver arithmetic (NULL sum -> TypeError; all-zero -> ZeroDivision)."""
    from wpvectordb_spark.operators import curation as CU

    docs = spark.createDataFrame(
        [
            (1, "hello world tokens here", "en"),
            (2, None, "xx"),
            (3, "", "zz"),
        ],
        "doc_id long, text string, lang string",
    )
    budgets = CU.temperature_budgets(docs, total_budget=1000, alpha=0.5)
    assert set(budgets) == {"en"}
    all_null = spark.createDataFrame(
        [(1, None, "xx")], "doc_id long, text string, lang string"
    )
    assert CU.temperature_budgets(all_null, total_budget=1000) == {}


def test_gopher_quality_filter_rules(spark):
    """Each Gopher rule fires independently; NULL text fails the NULL
    comparisons; the failure count is auditable per document."""
    rows = [
        # good: 6 tokens of mean length in range, has stopwords, no dups
        (1, "the quick brown foxes jumped over distant fences today"),
        # too few tokens
        (2, "the tiny one"),
        # mean token length too long
        (3, "extraordinarily incomprehensible characteristically "
            "overwhelmingly sophisticated multidimensional the"),
        # no stopwords at all
        (4, "zebra yak xylophone walrus vulture unicorn tiger snake"),
        # duplicate-token spam
        (5, "the spam spam spam spam spam spam spam spam spam"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in CU.gopher_quality_filter(
            df, min_tokens=5, min_stopword_ratio=0.05,
            max_dup_token_ratio=0.5,
        ).collect()
    }
    assert got[1]["kept"] == 1 and got[1]["n_rules_failed"] == 0
    assert got[2]["kept"] == 0 and got[2]["n_rules_failed"] == 1
    assert got[3]["kept"] == 0  # mean token length rule
    assert got[4]["kept"] == 0 and got[4]["n_rules_failed"] == 1  # stopwords
    assert got[5]["kept"] == 0  # dup-token rule (stopword ratio passes: 1/10)
    # NULL text: token features NULL -> every NULL comparison fails
    assert got[6]["n_tokens"] is None and got[6]["kept"] == 0
    assert got[6]["n_rules_failed"] >= 3


def test_gopher_quality_filter_cross_engine_parity(spark, duck):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    s = sorted(
        map(
            tuple,
            CU.gopher_quality_filter(
                docs, min_tokens=30, min_stopword_ratio=0.02,
                max_dup_token_ratio=0.6,
            ).collect(),
        ),
        key=repr,
    )
    d = sorted(
        duck.sql(
            CU.sql_gopher_quality_filter(
                f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')",
                min_tokens=30, min_stopword_ratio=0.02,
                max_dup_token_ratio=0.6,
            )
        ).fetchall(),
        key=repr,
    )
    assert s == d
    # both outcomes fire on this corpus (non-vacuous thresholds)
    kept = {r[3] for r in s}
    assert kept == {0, 1}


def test_decontaminate_spans_golden(spark):
    """Hand-built corpus: doc 201 quotes holdout h1's 6-token run
    verbatim (cut, the rest kept); doc 202 shares nothing (full
    roundtrip); doc 203 IS a holdout doc verbatim (fully cut); doc 204
    is shorter than k (no windows — untouchable by construction)."""
    schema = "doc_id long, text string"
    quote = "alpha beta gamma delta epsilon zeta"
    corpus = spark.createDataFrame(
        [
            (201, f"intro words {quote} closing remarks here"),
            (202, "completely different content nothing shared at all"),
            (203, quote),
            (204, "tiny doc"),
        ],
        schema,
    )
    holdout = spark.createDataFrame([(1, quote), (2, "another eval item")], schema)
    rows = {
        r["doc_id"]: r
        for r in CU.decontaminate_spans(corpus, holdout, k=4).collect()
    }
    # 201: tokens 3..8 (0-based 2..7) covered by the three 4-windows of
    # the quote that appear in h1 — exactly the 6 quote tokens cut
    assert rows[201]["n_tokens"] == 11
    assert rows[201]["n_kept"] == 5
    assert rows[201]["text"] == "intro words closing remarks here"
    # 202: untouched roundtrip
    assert rows[202]["n_kept"] == rows[202]["n_tokens"]
    assert rows[202]["text"] == "completely different content nothing shared at all"
    # 203: verbatim holdout copy — fully redacted
    assert rows[203]["n_kept"] == 0 and rows[203]["text"] == ""
    # 204: < k tokens, no windows, untouched
    assert rows[204]["n_kept"] == rows[204]["n_tokens"] == 2


def test_decontaminate_spans_shuffle_mode_matches_broadcast(spark, docs):
    # sort before limit: an unordered LIMIT re-evaluates per plan and
    # could hand the two paths different 60-doc subsets
    corpus = docs.where(F.col("doc_id") >= 20).orderBy("doc_id").limit(60)
    hold = docs.where(F.col("doc_id") < 20)
    bcast = CU.decontaminate_spans(corpus, hold, k=4)
    shuf = CU.decontaminate_spans(corpus, hold, k=4, broadcast_holdout=False)
    assert sorted(map(tuple, bcast.collect()), key=repr) == sorted(
        map(tuple, shuf.collect()), key=repr
    )


def test_decontaminate_spans_duckdb_parity(spark, duck, docs):
    from tests.conftest import assert_parity

    sdf = CU.decontaminate_spans(
        docs.where(F.col("doc_id") >= 20),
        docs.where(F.col("doc_id") < 20),
        k=4,
    )
    rel = duck.sql(
        CU.sql_decontaminate_spans(
            "SELECT doc_id, text FROM documents WHERE doc_id >= 20",
            "SELECT doc_id, text FROM documents WHERE doc_id < 20",
            k=4,
        )
    )
    rows = sdf.collect()
    assert_parity(sdf, rel, precollected=rows)
    # non-vacuous on this corpus: some docs redacted, some untouched
    touched = [r for r in rows if r["n_kept"] < r["n_tokens"]]
    clean = [r for r in rows if r["n_kept"] == r["n_tokens"]]
    assert touched and clean


def test_expand_budgets_golden(spark):
    """Strata: a has 4 docs / budget 10 (2 full epochs + 2 extras),
    b has 3 docs / budget 2 (sub-epoch: only 2 of 3 appear once),
    c has 1 doc / no budget (absent from output)."""
    docs = spark.createDataFrame(
        [(i, "a") for i in range(4)]
        + [(10 + i, "b") for i in range(3)]
        + [(20, "c")],
        "doc_id long, lang string",
    )
    rows = CU.expand_budgets(docs, {"a": 10, "b": 2}).collect()
    by_stratum: dict[str, list] = {}
    for r in rows:
        by_stratum.setdefault(r["stratum"], []).append(r)
    # emitted row count per stratum EQUALS the budget
    assert len(by_stratum["a"]) == 10
    assert len(by_stratum["b"]) == 2
    assert "c" not in by_stratum
    # stratum a: every doc 2 or 3 times, exactly two docs 3 times
    copies_a = {}
    for r in by_stratum["a"]:
        copies_a[r["doc_id"]] = copies_a.get(r["doc_id"], 0) + 1
    assert sorted(copies_a.values()) == [2, 2, 3, 3]
    assert set(copies_a) == {0, 1, 2, 3}
    # epochs are 0..n_copies-1 per doc
    for did, n in copies_a.items():
        eps = sorted(r["epoch"] for r in by_stratum["a"] if r["doc_id"] == did)
        assert eps == list(range(n))
    # stratum b: two distinct docs, one copy each
    assert sorted(r["epoch"] for r in by_stratum["b"]) == [0, 0]
    assert len({r["doc_id"] for r in by_stratum["b"]}) == 2
    # deterministic: identical re-run
    rows2 = CU.expand_budgets(docs, {"a": 10, "b": 2}).collect()
    assert sorted(map(tuple, rows), key=repr) == sorted(map(tuple, rows2), key=repr)
    # a different seed picks different remainder winners eventually
    # (not asserted per-doc: just that the call is valid)
    assert len(CU.expand_budgets(docs, {"a": 10, "b": 2}, seed=7).collect()) == 12
    with pytest.raises(ValueError):
        CU.expand_budgets(docs, {"a": -1})


def test_expand_budgets_cross_stratum_ids_do_not_leak_extras(spark, duck):
    """A doc_id present in TWO strata must not carry a remainder win
    from one stratum into the other: per-stratum row counts stay exactly
    the budgets (the id-only extras join regression)."""
    rows = [(1, "a"), (2, "a"), (3, "a"), (1, "b"), (4, "b"), (5, "b")]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    budgets = {"a": 4, "b": 3}
    out = CU.expand_budgets(docs, budgets).collect()
    per = {}
    for r in out:
        per[r["stratum"]] = per.get(r["stratum"], 0) + 1
    assert per == budgets
    # mirror agrees on the same frame
    duck.execute("CREATE OR REPLACE TEMP TABLE eb_x(doc_id BIGINT, lang VARCHAR)")
    duck.executemany("INSERT INTO eb_x VALUES (?, ?)", rows)
    d = sorted(
        duck.sql(CU.sql_expand_budgets(budgets, table="eb_x")).fetchall(),
        key=repr,
    )
    assert sorted(map(tuple, out), key=repr) == d
    duck.execute("DROP TABLE eb_x")


def test_expand_budgets_duckdb_parity(spark, duck, docs):
    from tests.conftest import assert_parity

    budgets = {"en": 500, "de": 175, "zh": 30}
    sdf = CU.expand_budgets(docs, budgets)
    rel = duck.sql(CU.sql_expand_budgets(budgets))
    rows = sdf.collect()
    assert_parity(sdf, rel, precollected=rows)
    # row count per stratum == budget (strata are non-empty here)
    per = {}
    for r in rows:
        per[r["stratum"]] = per.get(r["stratum"], 0) + 1
    assert per == budgets


def test_expand_budgets_quoted_stratum_key_parity(spark, duck):
    """A stratum key containing a single quote must survive BOTH
    surfaces: the Spark path builds F.lit predicates, and the SQL
    mirror doubles quotes (_sql_str_lit) instead of emitting broken or
    injectable literals."""
    rows = [(1, "it's"), (2, "it's"), (3, "plain")]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    budgets = {"it's": 3, "plain": 1}
    out = CU.expand_budgets(docs, budgets).collect()
    per = {}
    for r in out:
        per[r["stratum"]] = per.get(r["stratum"], 0) + 1
    assert per == budgets
    duck.execute("CREATE OR REPLACE TEMP TABLE eb_q(doc_id BIGINT, lang VARCHAR)")
    duck.executemany("INSERT INTO eb_q VALUES (?, ?)", rows)
    d = sorted(
        duck.sql(CU.sql_expand_budgets(budgets, table="eb_q")).fetchall(),
        key=repr,
    )
    assert sorted(map(tuple, out), key=repr) == d
    duck.execute("DROP TABLE eb_q")
    # control characters are rejected on the mirror surface outright
    import pytest

    with pytest.raises(ValueError):
        CU.sql_expand_budgets({"bad\nkey": 1})


def test_expand_budgets_threshold_is_overflow_safe():
    """The remainder prefilter threshold must stay in int64 for any
    stratum size — the divide-first form (2^32 div n + 1) * min(rem +
    margin, n) is a superset of the naive (rem+margin)*2^32/n fraction
    and never exceeds 2^32 + n (the naive product wraps negative past
    ~2^31 docs/stratum, silently emitting zero remainder winners)."""
    import math

    R = CU.HASH_RANGE
    for n in (1, 2, 1000, 2**31 + 7, 2**33, 2**40):
        for rem in (0, 1, n // 2, n - 1):
            margin = 6 * math.isqrt(max(rem, 0)) + 20
            safe = (R // n + 1) * min(rem + margin, n)
            true_frac = (rem + margin) * R // n  # exact in Python ints
            assert safe >= min(true_frac, R) or safe >= R
            assert safe <= R + n  # int64-safe for any feasible n
            if rem + margin >= n:
                assert safe >= R  # admit-everything regime preserved


def test_domain_quality_filter_golden(spark):
    """spamland avg 0.2 -> dropped; goodsite avg 0.8 -> kept; NULL
    domain is its own (kept) group; a 1-doc domain under min_docs is
    kept regardless of its terrible score."""
    scored = spark.createDataFrame(
        [
            (1, "spamland", 0.1),
            (2, "spamland", 0.3),
            (3, "goodsite", 0.7),
            (4, "goodsite", 0.9),
            (5, None, 0.6),
            (6, None, 0.6),
            (7, "tiny", 0.05),
            (8, "unscored", None),
            (9, "unscored", None),
        ],
        "doc_id long, domain string, quality double",
    )
    rows = {
        r["doc_id"]: r
        for r in CU.domain_quality_filter(
            scored, min_avg_quality=0.5, min_docs=2
        ).collect()
    }
    assert len(rows) == 9  # NULL-domain docs NOT silently deleted
    assert rows[1]["kept"] == 0 and rows[2]["kept"] == 0
    assert rows[1]["domain_avg_quality"] == 0.2
    assert rows[3]["kept"] == 1 and rows[3]["n_docs_in_domain"] == 2
    assert rows[5]["kept"] == 1 and rows[5]["domain"] is None
    assert rows[7]["kept"] == 1  # min_docs escape hatch
    # an all-NULL-score domain at size >= min_docs FAILS CLOSED: kept is
    # 0 (never NULL — the flag is two-valued in both engines)
    assert rows[8]["domain_avg_quality"] is None and rows[8]["kept"] == 0
    # with min_docs=1 the tiny domain is convicted
    strict = {
        r["doc_id"]: r
        for r in CU.domain_quality_filter(
            scored, min_avg_quality=0.5, min_docs=1
        ).collect()
    }
    assert strict[7]["kept"] == 0


def test_domain_quality_filter_duckdb_parity(spark, duck, docs):
    from tests.conftest import assert_parity
    from wpvectordb_spark.operators import text_analysis as TA

    scored = docs.select(
        "doc_id", F.col("source").alias("domain"),
        TA.quality_score("text").alias("quality"),
    )
    sdf = CU.domain_quality_filter(scored, min_avg_quality=0.65)
    rel = duck.sql(
        CU.sql_domain_quality_filter(
            f"SELECT doc_id, source AS domain, {TA.sql_quality_score('text')}"
            " AS quality FROM documents",
            min_avg_quality=0.65,
        )
    )
    rows = sdf.collect()
    assert_parity(sdf, rel, precollected=rows)
    # threshold splits this corpus: kept and dropped domains both present
    assert {r["kept"] for r in rows} == {0, 1}


def test_rank_normalize_golden(spark):
    """Known ranks: 4-doc stratum gets 0, 1/3, 2/3, 1; ties share; a
    1-row stratum calibrates to 0.0; NULL scores are dropped."""
    scored = spark.createDataFrame(
        [
            (1, "a", 0.1),
            (2, "a", 0.5),
            (3, "a", 0.5),
            (4, "a", 0.9),
            (5, "b", 0.7),
            (6, "a", None),
        ],
        "doc_id long, lang string, quality double",
    )
    rows = {r["doc_id"]: r for r in CU.rank_normalize(scored).collect()}
    assert set(rows) == {1, 2, 3, 4, 5}  # NULL score dropped
    assert rows[1]["calibrated"] == 0.0
    assert rows[2]["calibrated"] == rows[3]["calibrated"]  # ties share
    assert abs(rows[2]["calibrated"] - 1 / 3) < 1e-9
    assert rows[4]["calibrated"] == 1.0
    assert rows[5]["calibrated"] == 0.0  # singleton stratum


def test_rank_normalize_duckdb_parity(spark, duck, docs):
    from tests.conftest import assert_parity
    from wpvectordb_spark.operators import text_analysis as TA

    scored = docs.select(
        "doc_id", "lang", TA.quality_score("text").alias("quality")
    )
    sdf = CU.rank_normalize(scored)
    rel = duck.sql(
        CU.sql_rank_normalize(
            f"SELECT doc_id, lang, {TA.sql_quality_score('text')}"
            " AS quality FROM documents"
        )
    )
    rows = sdf.collect()
    assert_parity(sdf, rel, precollected=rows)
    # each multi-doc stratum anchors at 0.0 and spreads upward (ties at
    # the TOP keep max below 1.0: percent_rank gives tied rows the rank
    # of their first member)
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["calibrated"])
    for lang, cals in by_lang.items():
        if len(cals) > 1:
            assert min(cals) == 0.0
            assert 0.5 < max(cals) <= 1.0
            assert len(set(cals)) > 1


def test_phrase_blocklist_filter_golden(spark):
    docs = spark.createDataFrame(
        [
            (1, "clean page about Spark shuffles"),
            (2, "this page mentions JavaScript somewhere"),  # case-insensitive
            (3, "lorem ipsum dolor AND javascript too"),     # two hits
            (4, None),                                        # NULL text kept
            (5, "javascripts embedded substring hits"),       # substring match
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in CU.phrase_blocklist_filter(
            docs, ["javascript", "lorem ipsum"]
        ).collect()
    }
    assert rows[1]["kept"] == 1 and rows[1]["n_hits"] == 0
    assert rows[2]["kept"] == 0 and rows[2]["n_hits"] == 1
    assert rows[3]["n_hits"] == 2
    assert rows[4]["kept"] == 1 and rows[4]["n_hits"] == 0
    assert rows[5]["kept"] == 0  # substring containment, like the C4 tool
    # 501 duplicates of one phrase dedupe to 1 and are FINE; 501
    # distinct phrases trip the literal-expression guard
    assert (
        CU.phrase_blocklist_filter(docs, ["javascript"] * 501)
        .where(F.col("doc_id") == 2)
        .collect()[0]["n_hits"]
        == 1
    )
    for bad in ([], ["ok", "  "], ["o'quote"], [f"x{i}" for i in range(501)]):
        with pytest.raises(ValueError):
            CU.phrase_blocklist_filter(docs, bad)


def test_phrase_blocklist_filter_duckdb_parity(spark, duck, docs):
    from tests.conftest import assert_parity
    import __spark_entry__ as E

    sdf = CU.phrase_blocklist_filter(docs, E.BLOCKLIST_PHRASES)
    rel = duck.sql(CU.sql_phrase_blocklist_filter(E.BLOCKLIST_PHRASES))
    rows = sdf.collect()
    assert_parity(sdf, rel, precollected=rows)
    # the arm phrases split this corpus: hit and clean pages both fire
    assert {r["kept"] for r in rows} == {0, 1}


def test_phrase_blocklist_dedupes_and_guards_sql_surface(spark, duck):
    """Case-variant duplicate phrases count a single occurrence once
    (distinct-phrase semantics), and the SQL mirror enforces the SAME
    input guards as the DataFrame surface."""
    docs = spark.createDataFrame(
        [(1, "a page about javascript only")], "doc_id long, text string"
    )
    rows = CU.phrase_blocklist_filter(
        docs, ["JavaScript", "javascript", "JAVASCRIPT"]
    ).collect()
    assert rows[0]["n_hits"] == 1
    d = duck.sql(
        CU.sql_phrase_blocklist_filter(
            ["JavaScript", "javascript"],
            table="(SELECT 1 AS doc_id, 'about javascript' AS text)",
        )
    ).fetchall()
    assert d[0][1] == 1
    for bad in ([], ["ok", "  "], ["o'quote"], [f"x{i}" for i in range(501)]):
        with pytest.raises(ValueError):
            CU.sql_phrase_blocklist_filter(bad)


def test_weighted_budget_sample_fills_mass_within_one_doc(spark, duck):
    """The soft-dedup wiring end-to-end: cluster weights (1/|cluster|)
    feed weighted_budget_sample, each stratum's kept MASS never exceeds
    its budget and undershoots by less than one doc's weight; raising a
    budget only grows the kept set; NULL weights and unbudgeted strata
    drop; the DuckDB mirror matches row-for-row."""
    from wpvectordb_spark.operators import dedup as D

    # components: an en 4-cluster (w=0.25 each), an en pair (0.5), an es
    # pair; singletons complete at 1.0 via the corpus arg
    comp = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 100), (5, 200), (6, 200),
         (30, 300), (31, 300)],
        "doc_id long, component_id long",
    )
    corpus_rows = [(i, "en" if i < 30 else ("es" if i < 40 else "de"))
                   for i in range(1, 60)]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, lang string")
    weights = D.soft_dedup_weights(comp, corpus)
    weighted = weights.join(corpus, "doc_id")
    budgets = {"en": 7.5, "es": 3.25}
    kept = CU.weighted_budget_sample(weighted, budgets).collect()
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r["lang"], []).append(r)
    assert set(by_lang) <= {"en", "es"}  # 'de' unbudgeted -> dropped
    all_w = {r["doc_id"]: r["weight"] for r in weighted.collect()}
    for lang, budget in budgets.items():
        mass = sum(r["weight"] for r in by_lang.get(lang, []))
        stratum_mass = sum(
            w for d, w in all_w.items()
            if dict(corpus_rows)[d] == lang
        )
        assert mass <= budget + 1e-9
        if mass < stratum_mass - 1e-9:  # budget actually binds
            # within one doc's weight of the budget (weights <= 1.0)
            assert budget - mass < 1.0
    # monotone: raising en's budget only grows en's kept set
    kept2 = CU.weighted_budget_sample(
        weighted, {"en": 9.0, "es": 3.25}
    ).collect()
    assert {r["doc_id"] for r in kept} <= {r["doc_id"] for r in kept2}
    # NULL weight drops instead of poisoning the cumulative sum
    with_null = weighted.select("doc_id", "lang", "weight").unionByName(
        spark.createDataFrame(
            [(999, None, "en")], "doc_id long, weight double, lang string"
        ).select("doc_id", "lang", "weight")
    )
    kept3 = CU.weighted_budget_sample(with_null, budgets).collect()
    assert all(r["doc_id"] != 999 for r in kept3)
    # negative budget is rejected loudly
    with pytest.raises(ValueError):
        CU.weighted_budget_sample(weighted, {"en": -1.0})
    # negative WEIGHT is refused at execution (the stats-agg min guard:
    # a negative weight makes the cumulative mass non-monotonic, so the
    # kept set would no longer be a budget prefix — VERDICT round 9
    # item 7).  No extra scan: the check rides the existing stats agg.
    with_neg = weighted.select("doc_id", "lang", "weight").unionByName(
        spark.createDataFrame(
            [(998, -0.5, "en")], "doc_id long, weight double, lang string"
        ).select("doc_id", "lang", "weight")
    )
    with pytest.raises(Exception, match="negative weight"):
        CU.weighted_budget_sample(with_neg, budgets).collect()
    # ...but an UNBUDGETED stratum keeps its documented silent drop —
    # its rows can never be sampled, so a negative weight there is
    # inert (and the unchanged mirror drops it too)
    with_neg_unbudgeted = weighted.select(
        "doc_id", "lang", "weight"
    ).unionByName(
        spark.createDataFrame(
            [(997, -0.5, "de")], "doc_id long, weight double, lang string"
        ).select("doc_id", "lang", "weight")
    )
    kept4 = CU.weighted_budget_sample(with_neg_unbudgeted, budgets).collect()
    assert sorted(r["doc_id"] for r in kept4) == sorted(
        r["doc_id"] for r in kept
    )
    # mirror parity on the same frame
    duck.execute(
        "CREATE OR REPLACE TEMP TABLE wbs_in(doc_id BIGINT, lang VARCHAR,"
        " weight DOUBLE)"
    )
    duck.executemany(
        "INSERT INTO wbs_in VALUES (?, ?, ?)",
        [(r["doc_id"], r["lang"], r["weight"])
         for r in weighted.select("doc_id", "lang", "weight").collect()],
    )
    d = sorted(
        duck.sql(
            CU.sql_weighted_budget_sample("SELECT * FROM wbs_in", budgets)
        ).fetchall()
    )
    s = sorted(
        map(tuple, CU.weighted_budget_sample(weighted, budgets)
            .select("doc_id", "lang", "weight").collect())
    )
    assert s == d
    duck.execute("DROP TABLE wbs_in")


def test_weighted_budget_sample_randomized_vs_python_reference(spark, duck):
    """Seeded randomized cross-validation: Spark, DuckDB, and a pure-
    Python reference implementing the same spec (Wang hash order,
    integer micro-mass, superset prefilter, inclusive-cumsum fill) must
    agree on the exact kept set — the three implementations share no
    code, so agreement pins the arithmetic, not the implementation."""
    import math
    import random

    def py_id_hash(i: int) -> int:
        h = i % CU.HASH_RANGE
        for _ in range(2):
            h = ((h >> 16) ^ h) * CU.WANG_MUL % CU.HASH_RANGE
        return (h >> 16) ^ h

    def py_reference(rows, budgets):
        kept = []
        by_stratum: dict[str, list] = {}
        for doc_id, stratum, w in rows:
            if w is None or stratum is None:
                continue
            by_stratum.setdefault(stratum, []).append((doc_id, w))
        for stratum, members in by_stratum.items():
            if stratum not in budgets:
                continue
            b = int(round(budgets[stratum] * CU.WEIGHT_SCALE))
            if b <= 0:
                continue
            wints = {d: int(round(w * CU.WEIGHT_SCALE)) for d, w in members}
            m = sum(wints.values())
            wmax = max(wints.values())
            if b >= m:
                thr = CU.HASH_RANGE
            else:
                target = b + int(
                    math.floor(6.0 * math.sqrt(float(b) * wmax))
                ) + 20 * wmax
                thr = int(
                    math.floor(float(target) / float(m) * float(CU.HASH_RANGE))
                ) + 1
            pre = sorted(
                ((py_id_hash(d), d, w) for d, w in members
                 if py_id_hash(d) < thr),
            )
            cum = 0
            for _h, d, w in pre:
                cum += wints[d]
                if cum <= b:
                    kept.append((d, stratum, w))
        return sorted(kept)

    rng = random.Random(20260816)
    for trial in range(3):
        rows = [
            (
                rng.randrange(1, 10_000_000),
                rng.choice(["en", "de", "fr", None]),
                round(1.0 / rng.randint(1, 9), 9),
            )
            for _ in range(200)
        ]
        # unique ids (the operator's contract)
        rows = list({r[0]: r for r in rows}.values())
        budgets = {
            "en": round(rng.uniform(0.5, 40.0), 3),
            "de": round(rng.uniform(0.5, 40.0), 3),
        }
        df = spark.createDataFrame(
            rows, "doc_id long, lang string, weight double"
        )
        s = sorted(
            map(tuple, CU.weighted_budget_sample(df, budgets).collect())
        )
        duck.execute(
            "CREATE OR REPLACE TEMP TABLE wbs_r(doc_id BIGINT,"
            " lang VARCHAR, weight DOUBLE)"
        )
        duck.executemany("INSERT INTO wbs_r VALUES (?, ?, ?)", rows)
        d = sorted(
            duck.sql(
                CU.sql_weighted_budget_sample("SELECT * FROM wbs_r", budgets)
            ).fetchall()
        )
        p = py_reference(rows, budgets)
        assert s == d == p, f"trial {trial}: spark/duck/python disagree"
        # fill invariant: per-stratum kept mass never exceeds the budget
        mass: dict[str, float] = {}
        for _d, lang, w in s:
            mass[lang] = mass.get(lang, 0.0) + w
        for lang, b in budgets.items():
            assert mass.get(lang, 0.0) <= b + 1e-9
        duck.execute("DROP TABLE wbs_r")
