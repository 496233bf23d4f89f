"""BPE trainer/encoder (operators/bpe.py): merge semantics, boundary
non-ambiguity, leftmost-greedy overlap handling, and training
determinism — the invariants the bracketed-string representation
exists to guarantee."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etlutil_spark.operators.bpe import (
    SYM_L,
    SYM_R,
    bpe_segmentation,
    bpe_symbol_count,
    bpe_train_merges,
    bracketed_chars,
    merge_replace,
)


def _seg_to_symbols(s: str) -> list[str]:
    return s[1:-1].split(SYM_R + SYM_L) if s else []


def _apply(spark, tok: str, merges) -> list[str]:
    row = (
        spark.range(1)
        .select(bpe_segmentation(F.lit(tok), merges).alias("w"))
        .collect()[0]
    )
    return _seg_to_symbols(row["w"])


class TestMergeSemantics:
    def test_basic_chain(self, spark):
        merges = [("h", "e"), ("t", "he"), ("the", "r")]
        assert _apply(spark, "there", merges) == ["ther", "e"]
        assert _apply(spark, "the", merges) == ["the"]
        assert _apply(spark, "he", merges) == ["he"]

    def test_merge_never_fires_across_symbol_boundary(self, spark):
        """["xa","b"] must NOT merge under (a,b) — the bracket
        representation exists to make 'a b' unambiguous."""
        merges = [("x", "a"), ("a", "b")]
        # "xab": (x,a) -> ["xa","b"]; (a,b) must not fire inside "xa"+"b"
        assert _apply(spark, "xab", merges) == ["xa", "b"]
        # but a real ["a","b"] pair still merges
        assert _apply(spark, "ab", merges) == ["ab"]

    def test_overlapping_run_is_leftmost_greedy(self, spark):
        # "aaa" under (a,a): leftmost pair merges, third 'a' is left over
        assert _apply(spark, "aaa", [("a", "a")]) == ["aa", "a"]
        # "aaaa": two non-overlapping merges
        assert _apply(spark, "aaaa", [("a", "a")]) == ["aa", "aa"]

    def test_single_char_token(self, spark):
        assert _apply(spark, "a", [("a", "a")]) == ["a"]

    def test_symbol_count_matches_segmentation(self, spark):
        merges = [("h", "e"), ("t", "he")]
        rows = (
            spark.createDataFrame([("the",), ("theme",), ("x",)], "tk string")
            .select(
                "tk",
                bpe_symbol_count("tk", merges).alias("n"),
                bpe_segmentation("tk", merges).alias("w"),
            )
            .collect()
        )
        for r in rows:
            assert r["n"] == len(_seg_to_symbols(r["w"]))


class TestTraining:
    def test_learns_the_classic_chain(self, spark):
        df = spark.createDataFrame(
            [("the theme there then",), ("other brother mother the",)],
            "text string",
        )
        merges = bpe_train_merges(df, "text", k=2)
        # 'he' is the most frequent pair, then 't'+'he'
        assert merges[0] == ("h", "e")
        assert merges[1] == ("t", "he")

    def test_training_is_deterministic(self, spark, sf_dir):
        from etlutil_spark.sources.testdata import load_table

        d = load_table(spark, "documents", sf_dir).where(
            F.col("text").isNotNull()
        )
        m1 = bpe_train_merges(d, "text", k=4)
        m2 = bpe_train_merges(d, "text", k=4)
        assert m1 == m2 and len(m1) == 4

    def test_stops_early_when_fully_merged(self, spark):
        # vocabulary of one 2-char word: round 1 merges it, round 2 has
        # no pairs left and must break instead of failing
        df = spark.createDataFrame([("ab ab ab",)], "text string")
        merges = bpe_train_merges(df, "text", k=5)
        assert merges == [("a", "b")]

    def test_bad_k_raises(self, spark):
        df = spark.createDataFrame([("x",)], "text string")
        with pytest.raises(ValueError, match="k must be"):
            bpe_train_merges(df, "text", k=0)

    def test_round_confs_restored_after_training(self, spark):
        # the trainer flips AQE off and pins shuffle.partitions to the
        # vocab's partition count for the merge rounds; both session
        # confs must come back to their pre-call values
        aqe = spark.conf.get("spark.sql.adaptive.enabled")
        parts = spark.conf.get("spark.sql.shuffle.partitions")
        df = spark.createDataFrame([("the theme there",)], "text string")
        bpe_train_merges(df, "text", k=2)
        assert spark.conf.get("spark.sql.adaptive.enabled") == aqe
        assert spark.conf.get("spark.sql.shuffle.partitions") == parts

    def test_round_confs_restored_on_error(self, spark):
        # restoration must also hold when a round dies mid-loop
        import etlutil_spark.operators.bpe as B

        aqe = spark.conf.get("spark.sql.adaptive.enabled")
        parts = spark.conf.get("spark.sql.shuffle.partitions")
        df = spark.createDataFrame([("abc abc",)], "text string")
        orig = B._train_rounds
        try:
            def boom(seg, merges, k):
                raise RuntimeError("round died")

            B._train_rounds = boom
            with pytest.raises(RuntimeError, match="round died"):
                bpe_train_merges(df, "text", k=2)
        finally:
            B._train_rounds = orig
        assert spark.conf.get("spark.sql.adaptive.enabled") == aqe
        assert spark.conf.get("spark.sql.shuffle.partitions") == parts


class TestVocabEncode:
    """The large-k encode path: segmentation table + join must agree
    bit-for-bit with the literal-replace chain on the same merges."""

    def test_vocab_encode_equals_chain_encode(self, spark, sf_dir):
        from etlutil_spark.functions.text import tokens
        from etlutil_spark.operators.bpe import (
            bpe_encode_join,
            bpe_segmentation_table,
            bpe_symbol_count,
        )
        from etlutil_spark.sources.testdata import load_table

        d = load_table(spark, "documents", sf_dir).where(
            F.col("text").isNotNull()
        )
        merges = bpe_train_merges(d, "text", k=12)
        tok = d.select(F.explode(tokens("text")).alias("tk"))
        chain = tok.select(
            "tk", bpe_symbol_count("tk", merges).alias("n_sym")
        )
        seg = bpe_segmentation_table(d, "text", merges)
        joined = bpe_encode_join(tok, seg).select("tk", "n_sym")
        assert sorted(map(tuple, chain.collect())) == sorted(
            map(tuple, joined.collect())
        )

    def test_single_char_words_survive_large_k(self, spark):
        """A fully-merged / 1-char word must neither crash training
        (the guard-below-explode defect) nor drop out of the
        segmentation table."""
        from etlutil_spark.operators.bpe import bpe_segmentation_table

        df = spark.createDataFrame(
            [("a ab ab abc abc abc x",)], "text string"
        )
        merges = bpe_train_merges(df, "text", k=8)  # exhausts early
        seg = bpe_segmentation_table(df, "text", merges)
        rows = {r["tk"]: r["n_sym"] for r in seg.collect()}
        assert rows["a"] == 1 and rows["x"] == 1
        assert rows["ab"] == 1  # merged
        assert set(rows) == {"a", "ab", "abc", "x"}


class TestExhaustedOracle:
    def test_oracle_exhausted_rounds_are_noops(self, spark):
        """ADVICE r8: bpe_train_merges breaks early when no pair
        remains; the unrolled oracle must treat those rounds as no-ops
        (LEFT JOIN on the empty top-1 CTE), not empty the whole chain
        via a CROSS JOIN. Tiny corpus: 'ab ab a b' exhausts after one
        merge; the k=8 oracle must still price every token."""
        import duckdb

        from etlutil_spark.functions.text import tokens
        from etlutil_spark.queries import _bpe_encode_oracle_sql

        text = "ab ab a b"
        merges = bpe_train_merges(
            spark.createDataFrame([(text,)], "text string"), "text", k=8
        )
        assert len(merges) < 8  # the corpus really exhausts early

        d = spark.createDataFrame([("s1", text)], "source string, text string")
        tok = d.select("source", F.explode(tokens("text")).alias("tk"))
        per = tok.select(
            "source",
            F.length("tk").cast("bigint").alias("nc"),
            bpe_symbol_count("tk", merges).alias("ns"),
        )
        got = (
            per.groupBy("source")
            .agg(
                F.count("*").cast("bigint").alias("n_tokens"),
                F.sum("nc").cast("bigint").alias("n_chars"),
                F.sum("ns").cast("bigint").alias("n_symbols"),
            )
            .collect()[0]
        )

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT 's1' AS source, '{text}' AS text"
        )
        sql = _bpe_encode_oracle_sql(k=8)
        want = con.execute(sql).fetchall()
        assert len(want) == 1, "oracle must not collapse to zero rows"
        w = want[0]  # (source, n_tokens, n_chars, n_symbols, ratios...)
        assert (got["n_tokens"], got["n_chars"], got["n_symbols"]) == (
            w[1], w[2], w[3],
        )


class TestRepresentation:
    def test_bracketed_roundtrip(self, spark):
        row = (
            spark.range(1)
            .select(bracketed_chars(F.lit("abc")).alias("w"))
            .collect()[0]
        )
        assert _seg_to_symbols(row["w"]) == ["a", "b", "c"]

    def test_merge_replace_replaces_all_occurrences(self, spark):
        w = bracketed_chars(F.lit("abab"))
        out = (
            spark.range(1)
            .select(merge_replace(w, "a", "b").alias("w"))
            .collect()[0]["w"]
        )
        assert _seg_to_symbols(out) == ["ab", "ab"]
