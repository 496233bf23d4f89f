"""gopher_quality_filter (operators/text_analysis.py): rule-based
curation filter with auditable drop reasons. Catalog parity for the
registered docs_gopher_filter query lives in test_oracle_parity.py;
these pin the rule semantics and edge cases on hand-built docs."""

from __future__ import annotations

from etlutil_spark.operators.text_analysis import gopher_quality_filter


def _run(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = gopher_quality_filter(df, "text", **kw)
    return {
        r["doc_id"]: (r["n_tokens"], r["reasons"], r["keep"])
        for r in out.collect()
    }


GOOD = (
    "the quick brown fox jumps over a lazy dog and then it runs to "
    "the old mill where a miller grinds wheat for the village that "
    "is near to it every day of that long summer for many years now"
)


class TestRules:
    def test_clean_doc_keeps(self, spark):
        got = _run(spark, [(1, GOOD)])
        n, reasons, keep = got[1]
        assert reasons == "" and keep and n >= 30

    def test_too_short(self, spark):
        got = _run(
            spark,
            [(1, "the little cat sits inside that big hat and looks around quietly today")],
        )
        assert got[1][1] == "too_short" and not got[1][2]

    def test_repetitive_and_reason_order_is_stable(self, spark):
        # 8 distinct tokens repeated: dup ratio far over the ceiling, and
        # also short -> both reasons, in rule order
        text = " ".join(["spam words here again and again the end"] * 3)
        got = _run(spark, [(1, text)])
        assert got[1][1] == "too_short,repetitive"

    def test_low_stopwords(self, spark):
        text = " ".join(f"token{i}" for i in range(40))
        got = _run(spark, [(1, text)])
        assert "low_stopwords" in got[1][1] and not got[1][2]

    def test_word_len_bounds(self, spark):
        short_words = "ab " * 40 + "the a of in is it to and that for " * 2
        long_words = " ".join(
            ["extraordinarily" for _ in range(35)]
            + ["the", "a", "of", "in", "is"]
        )
        got = _run(spark, [(1, short_words), (2, long_words)])
        assert "word_len_low" in got[1][1]
        assert "word_len_high" in got[2][1]

    def test_null_and_empty_text_are_empty_reason(self, spark):
        got = _run(spark, [(1, None), (2, ""), (3, "   ")])
        for i in (1, 2, 3):
            assert got[i] == (0, "empty", False)

    def test_thresholds_are_parameters(self, spark):
        got = _run(spark, [(1, "five words in this doc")], min_tokens=3)
        assert got[1][2]  # passes with a relaxed floor


class TestStripBoilerplate:
    def _frames(self, spark):
        head = "welcome to example dot com all rights reserved"  # 8 tokens
        return spark.createDataFrame(
            [
                (1, "a", f"{head} unique article one"),
                (2, "a", f"{head} another piece entirely"),
                (3, "a", "organic document with no shared header at all"),
                (4, "b", f"{head} same prefix but different source"),
                (5, "a", "tiny"),  # shorter than the probe: exempt
            ],
            "doc_id bigint, source string, text string",
        )

    def test_strips_repeated_prefix_within_group_only(self, spark):
        from etlutil_spark.operators.text_analysis import (
            strip_boilerplate_prefixes,
        )

        out = {
            r["doc_id"]: (r["text"], r["_prefix_stripped"])
            for r in strip_boilerplate_prefixes(
                self._frames(spark), "text", "source"
            ).collect()
        }
        assert out[1] == ("unique article one", True)
        assert out[2] == ("another piece entirely", True)
        # doc 3's prefix is unique; doc 4 shares the prefix but is the
        # only doc of source b; doc 5 is shorter than the probe window
        assert out[3][1] is False and "organic" in out[3][0]
        assert out[4][1] is False and out[4][0].startswith("welcome to")
        assert out[5] == ("tiny", False)

    def test_min_share_threshold(self, spark):
        from etlutil_spark.operators.text_analysis import (
            strip_boilerplate_prefixes,
        )

        # the repeated prefix covers 2 of source-a's 3 probe-eligible
        # docs: share 2/3 < 0.7 -> nothing stripped
        out = strip_boilerplate_prefixes(
            self._frames(spark), "text", "source", min_share=0.7
        )
        assert out.where("_prefix_stripped").count() == 0

    def test_strip_preserves_case_and_punctuation(self, spark):
        """The cut happens on the ORIGINAL characters: the kept remainder
        must keep its casing and punctuation (a token-rejoin would
        lowercase and strip it)."""
        from etlutil_spark.operators.text_analysis import (
            strip_boilerplate_prefixes,
        )

        head = "Welcome to EXAMPLE dot com, all rights reserved!"  # 8 tokens
        df = spark.createDataFrame(
            [
                (1, "a", f"{head} Does ACME Corp. ship to the E.U.?"),
                (2, "a", f"{head} Another Body, with Commas."),
            ],
            "doc_id bigint, source string, text string",
        )
        out = {
            r["doc_id"]: r["text"]
            for r in strip_boilerplate_prefixes(df, "text", "source").collect()
        }
        assert out[1] == "Does ACME Corp. ship to the E.U.?"
        assert out[2] == "Another Body, with Commas."
