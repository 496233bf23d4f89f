"""bloom_contaminated_docs (operators/decontaminate.py): the Bloom
candidate-screen variant of benchmark decontamination. Its contract is
EQUALITY with the exact path — Bloom filters have no false negatives and
the verify join removes the false positives — so these tests pin that,
plus the edge cases the bitset construction has to survive."""

from __future__ import annotations

from pyspark.sql import functions as F

from etlutil_spark.operators.decontaminate import (
    bloom_contaminated_docs,
    contaminated_docs,
    contamination_coverage,
)
from etlutil_spark.sources.testdata import load_table


def _pairs(df):
    return sorted((r["doc_id"], r["n_shared"]) for r in df.collect())


class TestBloomEqualsExact:
    def test_matches_exact_path_on_corpus(self, spark, sf_dir):
        d = load_table(spark, "documents", sf_dir)
        ev = d.where(F.col("source").isin("src0", "src1"))
        tr = d.where(~F.col("source").isin("src0", "src1"))
        exact = _pairs(contaminated_docs(tr, ev, n=3, min_shared=2))
        bloom = _pairs(bloom_contaminated_docs(tr, ev, n=3, min_shared=2))
        assert exact  # the corpus really is contaminated; not a 0==0 pass
        assert bloom == exact

    def test_matches_under_tiny_filter_high_fp_rate(self, spark, sf_dir):
        """2 bits/element + 1 hash ≈ a filter that passes a large share
        of clean shingles: the verify stage must still produce the exact
        answer (false positives cost time, never correctness)."""
        d = load_table(spark, "documents", sf_dir).limit(120)
        ev = d.where(F.col("source").isin("src0", "src1"))
        tr = d.where(~F.col("source").isin("src0", "src1"))
        exact = _pairs(contaminated_docs(tr, ev, n=3, min_shared=2))
        bloom = _pairs(
            bloom_contaminated_docs(
                tr, ev, n=3, min_shared=2, bits_per_element=2, n_hashes=1
            )
        )
        assert bloom == exact

    def test_empty_eval_side_yields_no_hits(self, spark):
        docs = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog")],
            "doc_id bigint, text string",
        )
        empty = docs.where(F.lit(False))
        assert bloom_contaminated_docs(docs, empty).collect() == []

    def test_coverage_separates_embedded_from_incidental(self, spark):
        """Span coverage is the removal signal: a doc embedding a whole
        eval sentence scores near 1.0; one sharing a single incidental
        trigram scores 3/n_tokens; clean docs don't appear."""
        tr = spark.createDataFrame(
            [
                # 6 tokens, all covered by eval trigrams
                (1, "the secret eval answer is here"),
                # 8 tokens, one shared trigram covers 3 positions
                (2, "unrelated stuff the secret eval padding words here"),
                (3, "totally clean document with no overlap at all"),
            ],
            "doc_id bigint, text string",
        )
        ev = spark.createDataFrame(
            [(100, "the secret eval answer is here obviously")],
            "doc_id bigint, text string",
        )
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_covered"], r["coverage"])
            for r in contamination_coverage(tr, ev, n=3).collect()
        }
        assert set(got) == {1, 2}
        assert got[1] == (6, 6, 1.0)
        assert got[2] == (8, 3, 3 / 8)

    def test_coverage_overlapping_matches_count_positions_once(self, spark):
        """Two overlapping matched trigrams share positions; the distinct
        keeps each covered position single-counted."""
        tr = spark.createDataFrame(
            [(1, "a b c d zz")], "doc_id bigint, text string"
        )
        ev = spark.createDataFrame(
            [(100, "a b c d")], "doc_id bigint, text string"
        )
        got = contamination_coverage(tr, ev, n=3).collect()[0]
        # matches 'a b c' (0-2) and 'b c d' (1-3): 4 distinct positions
        assert (got["n_tokens"], got["n_covered"]) == (5, 4)
        assert got["coverage"] == 4 / 5

    def test_handmade_overlap(self, spark):
        tr = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon"),  # shares 3 shingles
                (2, "completely different words here now"),
                (3, "alpha beta gamma zzz"),  # shares only 1 shingle
            ],
            "doc_id bigint, text string",
        )
        ev = spark.createDataFrame(
            [(100, "alpha beta gamma delta epsilon zeta")],
            "doc_id bigint, text string",
        )
        got = _pairs(bloom_contaminated_docs(tr, ev, n=3, min_shared=2))
        assert got == [(1, 3)]
