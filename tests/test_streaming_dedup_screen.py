"""Streaming incremental near-dup screen (streaming/dedup_screen.py):
micro-batches of documents are deduped within the batch, screened
against the persisted band index, and appended — the continuous-ingest
twin of operators/dedup.py:screen_against_corpus.

Fixture design: duplicate docs are EXACT text copies (Jaccard 1.0) and
distinct docs share no vocabulary (Jaccard 0.0), so greedy-sequential
and global keep-first agree and the expected accepted set is exact."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etlutil_spark.streaming.dedup_screen import (
    dedup_screen_batch,
    read_corpus,
    run_dedup_screen_stream,
)

FAM = {
    "A": "alpha apple anchor art atlas amber acorn arrow attic azure almond aria",
    "B": "bravo beach bridge bark bronze bubble barley bison brook badge butter bay",
    "C": "cedar coral canyon crisp candle copper cactus comet cobalt cliff cargo cove",
    "D": "delta dune dusk dagger dial dome drift dapple dew dynamo dory dockside den",
}

# (doc_id, family) per micro-batch; copies share the family text verbatim
BATCHES = [
    [(1, "A"), (2, "A"), (3, "B")],   # d2 intra-batch dup of d1
    [(4, "A"), (5, "C")],             # d4 cross-batch dup of d1
    [(6, "C"), (7, "D"), (8, "D")],   # d6 cross-batch dup, d8 intra dup
]
EXPECTED_ACCEPTED = {1, 3, 5, 7}


def _batch_df(spark, rows):
    return spark.createDataFrame(
        [(i, FAM[f]) for i, f in rows], "doc_id bigint, text string"
    )


class TestDedupScreenStream:
    def test_stream_accepts_exactly_the_non_dups(self, spark, tmp_path):
        src = str(tmp_path / "incoming")
        for rows in BATCHES:  # one file per micro-batch, written in order
            _batch_df(spark, rows).coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        corpus = str(tmp_path / "corpus")
        run_dedup_screen_stream(
            stream, corpus, checkpoint_dir=str(tmp_path / "ckpt")
        )

        docs, index = read_corpus(spark, corpus)
        got = {r["doc_id"] for r in docs.select("doc_id").collect()}
        assert got == EXPECTED_ACCEPTED
        # band index covers exactly the accepted docs, 8 bands each
        idx = index.groupBy("doc_id").count().collect()
        assert {r["doc_id"] for r in idx} == EXPECTED_ACCEPTED
        assert all(r["count"] == 8 for r in idx)
        # the screen invariant: no verified near-dup PAIR survives
        from etlutil_spark.operators.dedup import minhash_lsh_pairs

        assert (
            minhash_lsh_pairs(
                docs, "doc_id", "text", verify_threshold=0.7
            ).count()
            == 0
        )

    def test_batch_replay_is_idempotent(self, spark, tmp_path):
        corpus = str(tmp_path / "corpus")
        fb = dedup_screen_batch(corpus)
        b0 = _batch_df(spark, BATCHES[0])
        fb(b0, 0)
        docs1, _ = read_corpus(spark, corpus)
        ids1 = sorted(r["doc_id"] for r in docs1.collect())
        fb(b0, 0)  # foreachBatch retry of the SAME batch id
        docs2, index2 = read_corpus(spark, corpus)
        assert sorted(r["doc_id"] for r in docs2.collect()) == ids1
        assert index2.count() == len(ids1) * 8

    def test_reserved_batch_column_raises(self, spark, tmp_path):
        from etlutil_spark.streaming.dedup_screen import dedup_screen_batch

        fb = dedup_screen_batch(str(tmp_path / "corpus"))
        df = spark.createDataFrame(
            [(1, "x", 0)], "doc_id bigint, text string, batch int"
        )
        with pytest.raises(ValueError, match="reserved"):
            fb(df, 0)

    def test_empty_batch_is_noop(self, spark, tmp_path):
        corpus = str(tmp_path / "corpus")
        fb = dedup_screen_batch(corpus)
        fb(_batch_df(spark, []), 0)
        docs, index = read_corpus(spark, corpus)
        assert docs is None and index is None

    def test_exact_id_repeats_collapse(self, spark, tmp_path):
        """The same doc_id appearing twice in one batch (at-least-once
        sources) collapses before any screening."""
        corpus = str(tmp_path / "corpus")
        fb = dedup_screen_batch(corpus)
        df = spark.createDataFrame(
            [(1, FAM["A"]), (1, FAM["A"]), (2, FAM["B"])],
            "doc_id bigint, text string",
        )
        fb(df, 0)
        docs, _ = read_corpus(spark, corpus)
        assert sorted(r["doc_id"] for r in docs.collect()) == [1, 2]

    def test_prior_batch_id_not_reaccepted_on_text_change(
        self, spark, tmp_path
    ):
        """A doc_id accepted in an earlier batch must be rejected in a
        later batch even when its text changed beyond the near-dup
        threshold — id uniqueness is a corpus invariant, and the
        intra-batch dropDuplicates alone cannot enforce it."""
        corpus = str(tmp_path / "corpus")
        fb = dedup_screen_batch(corpus)
        fb(
            spark.createDataFrame(
                [(1, FAM["A"]), (2, FAM["B"])], "doc_id bigint, text string"
            ),
            0,
        )
        # batch 2: id 1 returns with COMPLETELY different text; id 3 new
        fb(
            spark.createDataFrame(
                [(1, FAM["C"]), (3, FAM["D"])], "doc_id bigint, text string"
            ),
            1,
        )
        docs, _ = read_corpus(spark, corpus)
        rows = sorted((r["doc_id"], r["text"]) for r in docs.collect())
        assert [i for i, _ in rows] == [1, 2, 3]
        assert rows[0][1] == FAM["A"]  # the FIRST accepted text survives

    def test_corpus_on_non_local_fs_uri(self, spark, tmp_path):
        """The corpus-existence probe must go through the Hadoop
        FileSystem API, not os.path.exists: a ``file:`` URI is invisible
        to the local-path check (os.path.exists('file:/x') is False even
        when /x exists), exactly like the s3a://gs://hdfs:// paths a real
        deployment uses. With the old check every batch would see
        (None, None), silently skip the cross-batch screen, and accept
        near-dups of prior batches — this drives the same batches
        through a file:-URI corpus and pins the cross-batch drops."""
        corpus = "file:" + str(tmp_path / "corpus")
        fb = dedup_screen_batch(corpus)
        for i, rows in enumerate(BATCHES):
            fb(_batch_df(spark, rows), i)
        docs, index = read_corpus(spark, corpus)
        assert docs is not None, "file: URI corpus not detected"
        got = {r["doc_id"] for r in docs.select("doc_id").collect()}
        assert got == EXPECTED_ACCEPTED

    def test_crash_between_writes_recovers_on_replay(self, spark, tmp_path):
        """Crash-recovery invariant: the index is written BEFORE the
        docs, so the only possible partial state is index-without-docs —
        which read_corpus treats as 'no corpus yet' and the batch's own
        replay overwrites. (Docs-without-index would instead fail every
        replay's corpus read on the missing index path.)"""
        import os

        from etlutil_spark.operators.dedup import minhash_band_index

        corpus = str(tmp_path / "corpus")
        b0 = _batch_df(spark, BATCHES[0])
        # simulate the crash: only the index write of batch 0 landed
        minhash_band_index(b0, "doc_id", "text").write.partitionBy(
            "band_idx"
        ).parquet(os.path.join(corpus, "index", "batch=0"))
        docs, index = read_corpus(spark, corpus)
        assert docs is None and index is None
        # the replay of batch 0 completes normally
        dedup_screen_batch(corpus)(b0, 0)
        docs, _ = read_corpus(spark, corpus)
        assert {r["doc_id"] for r in docs.collect()} == {1, 3}
