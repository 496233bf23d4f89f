"""paragraph_dedup (operators/dedup.py): corpus-wide paragraph-level
exact dedup with document reassembly. Catalog-level Spark-vs-DuckDB
parity for the registered `dedup_paragraphs` query (fixed-token
segmentation mode) lives in test_oracle_parity.py; these tests pin the
operator semantics — including the blank-line marker mode the synthetic
corpus can't exercise — on hand-built frames, plus a hypothesis property
sweep over random corpora."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etlutil_spark.operators.dedup import paragraph_dedup


def _run(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = paragraph_dedup(df, "doc_id", "text", **kw)
    return {r["doc_id"]: (r["text"], r["n_paras"], r["n_kept"]) for r in out.collect()}


class TestMarkerMode:
    def test_first_occurrence_wins_and_order_is_preserved(self, spark):
        got = _run(
            spark,
            [
                (1, "alpha beta\n\nshared boilerplate\n\ngamma"),
                (2, "shared boilerplate\n\ndelta"),
            ],
        )
        # doc 1 saw the boilerplate first (lower doc_id) and keeps it
        assert got[1] == ("alpha beta\n\nshared boilerplate\n\ngamma", 3, 3)
        # doc 2 loses its copy; its remaining paragraph keeps its place
        assert got[2] == ("delta", 2, 1)

    def test_within_doc_duplicate_keeps_earliest_position(self, spark):
        got = _run(spark, [(1, "x\n\ny\n\nx")])
        assert got[1] == ("x\n\ny", 3, 2)

    def test_fully_duplicate_doc_stays_visible_with_zero_kept(self, spark):
        got = _run(spark, [(1, "same\n\nthing"), (2, "same\n\nthing")])
        assert got[1] == ("same\n\nthing", 2, 2)
        assert got[2] == ("", 2, 0)

    def test_no_duplicates_roundtrips_normalized_text(self, spark):
        got = _run(spark, [(1, "one two\n\n\n\nthree"), (2, "four")])
        # \n{2,} splits collapse; paragraphs are trimmed then rejoined
        assert got[1] == ("one two\n\nthree", 2, 2)
        assert got[2] == ("four", 1, 1)

    def test_empty_and_null_text_drop_out(self, spark):
        df = spark.createDataFrame(
            [(1, "real\n\npara"), (2, ""), (3, None), (4, "   ")],
            "doc_id bigint, text string",
        )
        out = paragraph_dedup(df, "doc_id", "text")
        assert [r["doc_id"] for r in out.collect()] == [1]


class TestSegmentMode:
    def test_fixed_token_segments(self, spark):
        got = _run(
            spark,
            [(1, "a b c d e f g"), (2, "c d x")],
            segment_tokens=2,
        )
        # doc 1: [a b][c d][e f][g]; doc 2: [c d][x] — doc 2 loses 'c d'
        assert got[1] == ("a b c d e f g", 4, 4)
        assert got[2] == ("x", 2, 1)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    corpus=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=1, max_size=6),
        min_size=1,
        max_size=6,
    )
)
def test_property_each_paragraph_survives_exactly_once(spark_session_global, corpus):
    """Over random corpora drawn from a tiny paragraph vocabulary (high
    collision rate): (1) every distinct paragraph appearing anywhere
    survives exactly once corpus-wide; (2) it survives at its earliest
    (doc_id, position); (3) each doc's kept paragraphs preserve the
    original relative order; (4) n_paras/n_kept ledger adds up."""
    spark = spark_session_global
    docs = [(i, "\n\n".join(paras)) for i, paras in enumerate(corpus)]
    out = {
        r["doc_id"]: r
        for r in paragraph_dedup(
            spark.createDataFrame(docs, "doc_id bigint, text string"),
            "doc_id",
            "text",
        ).collect()
    }
    # expected survivors via the same first-occurrence rule in plain python
    first_owner: dict[str, tuple[int, int]] = {}
    for i, paras in enumerate(corpus):
        for j, p in enumerate(paras):
            first_owner.setdefault(p, (i, j))
    all_kept: list[str] = []
    for i, paras in enumerate(corpus):
        expected = [p for j, p in enumerate(paras) if first_owner[p] == (i, j)]
        got_paras = out[i]["text"].split("\n\n") if out[i]["text"] else []
        assert got_paras == expected, f"doc {i}: {got_paras} != {expected}"
        assert out[i]["n_paras"] == len(paras)
        assert out[i]["n_kept"] == len(expected)
        all_kept += got_paras
    assert sorted(all_kept) == sorted(set(p for paras in corpus for p in paras))


class TestBoilerplateSkew:
    def test_hot_paragraph_key_survives_at_volume(self, spark):
        """The scale claim behind the min-struct survivor: one paragraph
        duplicated across 20k docs (the boilerplate hot key that melts a
        row_number window's single reducer) — map-side partial combine
        keeps it one row per task, the answer stays exact."""
        from etlutil_spark.operators.dedup import paragraph_dedup

        hot = "all rights reserved contact us for details"
        rows = [(i, f"{hot}\n\nunique body {i}") for i in range(20_000)]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = paragraph_dedup(df, "doc_id", "text")
        agg = out.selectExpr(
            "sum(n_kept) as kept", "sum(n_paras) as total", "count(*) as docs"
        ).collect()[0]
        assert agg["docs"] == 20_000
        assert agg["total"] == 40_000
        # every unique body survives + exactly ONE copy of the hot para
        assert agg["kept"] == 20_001
        first = out.where("doc_id = 0").collect()[0]
        assert first["text"] == f"{hot}\n\nunique body 0"
        later = out.where("doc_id = 19999").collect()[0]
        assert later["text"] == "unique body 19999"


class TestDuplicateSpans:
    """r10: maximal cross-doc duplicated token spans (seed-and-chain
    form of the Lee et al. exact-substring primitive)."""

    def test_maximal_spans_exact_positions(self, spark):
        from etlutil_spark.operators.dedup import duplicate_spans

        common = " ".join(f"w{i}" for i in range(20))  # 20 shared tokens
        rows = [
            (1, f"{common} tail one two three"),
            (2, f"lead in {common} other stuff here"),
            (3, "completely different text with no overlap at all xyz"),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = {
            (r["id_a"], r["id_b"]): (r["a_start"], r["b_start"], r["span_tokens"])
            for r in duplicate_spans(
                df, "doc_id", "text", k=8, min_len=10
            ).collect()
        }
        # exactly one maximal span: docs 1&2 share the 20-token block;
        # doc 1 starts at token 1, doc 2 after its 2-token lead (pos 3)
        assert out == {(1, 2): (1, 3, 20)}

    def test_two_separate_spans_stay_separate(self, spark):
        from etlutil_spark.operators.dedup import duplicate_spans

        a = " ".join(f"a{i}" for i in range(10))
        b = " ".join(f"b{i}" for i in range(12))
        rows = [
            (1, f"{a} xxx yyy zzz {b}"),
            (2, f"{b} ppp qqq rrr sss ttt {a}"),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        spans = sorted(
            (r["span_tokens"], r["a_start"], r["b_start"])
            for r in duplicate_spans(
                df, "doc_id", "text", k=8, min_len=8
            ).collect()
        )
        # two islands on two different diagonals, never merged
        assert spans == [(10, 1, 18), (12, 14, 1)]

    def test_frequency_cap_drops_boilerplate_grams(self, spark):
        from etlutil_spark.operators.dedup import duplicate_spans

        boiler = " ".join(f"c{i}" for i in range(8))
        rows = [(i, f"{boiler} unique tail {i}") for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        # the 8-gram appears in 10 docs; cap at 5 occurrences kills it
        assert (
            duplicate_spans(
                df, "doc_id", "text", k=8, min_len=8, max_gram_freq=5
            ).count()
            == 0
        )
        # without the cap all 45 pairs report the span
        assert (
            duplicate_spans(
                df, "doc_id", "text", k=8, min_len=8, max_gram_freq=1000
            ).count()
            == 45
        )


class TestCutDuplicateSpans:
    """r10: the CUT half — keep-first-occurrence, per-doc interval
    union, exact cut accounting."""

    def test_overlapping_cuts_union_not_double_count(self, spark):
        from etlutil_spark.operators.dedup import cut_duplicate_spans

        base = " ".join(f"w{i}" for i in range(30))
        rows = [
            (1, base),                                   # first occurrence: kept
            (2, base + " different ending here now"),    # dup of 1 -> cut
            (3, " ".join(f"w{i}" for i in range(10, 30))),  # overlaps doc 1 tail
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = {
            r["doc_id"]: (r["n_tokens"], r["cut_tokens"])
            for r in cut_duplicate_spans(
                df, "doc_id", "text", k=8, min_len=8
            ).collect()
        }
        # doc 1 is the lowest id everywhere -> never cut
        assert out[1] == (30, 0)
        # doc 2 shares w0..w29 with doc 1 AND w10..w29 with... no: doc 3
        # has higher id than... doc 2 < doc 3, so doc 2 only cuts vs doc 1;
        # the two spans (vs doc1: all 30; vs doc3 none since 2<3 cuts doc3)
        assert out[2] == (34, 30)
        # doc 3 (highest id) duplicates w10..29 against BOTH doc 1 and
        # doc 2 — two identical 20-token cut intervals must union to 20
        assert out[3] == (20, 20)

    def test_clean_docs_pass_through(self, spark):
        from etlutil_spark.operators.dedup import cut_duplicate_spans

        rows = [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (2, "one two three four five six seven eight nine ten"),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = cut_duplicate_spans(df, "doc_id", "text", k=8, min_len=8).collect()
        assert {(r["doc_id"], r["cut_tokens"], r["kept_fraction"]) for r in out} == {
            (1, 0, 1.0),
            (2, 0, 1.0),
        }


class TestSpanFamilyEdgeCases:
    """r10 hardening: degenerate corpora must return empty frames with
    the right schema, never error."""

    def test_empty_and_single_doc_corpora(self, spark):
        from etlutil_spark.operators.dedup import (
            cut_duplicate_spans,
            duplicate_spans,
            self_repeated_spans,
        )

        empty = spark.createDataFrame([], "doc_id bigint, text string")
        one = spark.createDataFrame(
            [(1, "just one lonely document here")], "doc_id bigint, text string"
        )
        short = spark.createDataFrame(
            [(1, "too short"), (2, "also tiny")], "doc_id bigint, text string"
        )
        for df in (empty, one, short):
            assert duplicate_spans(df, "doc_id", "text", k=8, min_len=8).count() == 0
            assert (
                self_repeated_spans(df, "doc_id", "text", k=8, min_len=8).count()
                == 0
            )
        # cut accounting passes every non-empty doc through untouched
        out = {r["doc_id"]: r["cut_tokens"]
               for r in cut_duplicate_spans(short, "doc_id", "text", k=8, min_len=8).collect()}
        assert out == {1: 0, 2: 0}
        assert cut_duplicate_spans(empty, "doc_id", "text", k=8, min_len=8).count() == 0

    def test_bad_params_raise(self, spark):
        import pytest as _p

        from etlutil_spark.operators.dedup import (
            duplicate_spans,
            self_repeated_spans,
        )

        df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
        with _p.raises(ValueError):
            duplicate_spans(df, "doc_id", "text", k=1, min_len=1)
        with _p.raises(ValueError):
            self_repeated_spans(df, "doc_id", "text", k=4, min_len=2)


@pytest.fixture(scope="module")
def spark_session_global(spark):
    return spark
