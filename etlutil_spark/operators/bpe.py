"""Trainable byte-pair-encoding (BPE) over the word vocabulary —
train merges with Sennrich's algorithm, then apply them at scan speed
as pure column expressions.

Extends the first-merge candidate table (queries.py:docs_bpe_pair_merge)
to the FULL trainer loop, on the same scale recipe: aggregate the corpus
to its word vocabulary first (one token-keyed shuffle; Heaps' law keeps
|vocab| sub-linear in corpus size), then every merge round runs over the
vocabulary only — pair volume scales with |vocab|, never the corpus.
Encoding never joins: the trained merges are STRING LITERALS baked into
a chain of literal `replace` expressions (the kmeans centroids-as-
literals idiom), so applying the tokenizer to 100 TB of text is a
map-side projection with zero shuffles.

Segmentation state is a bracketed string: each symbol is wrapped as
``\\x01<symbol>\\x02``, so the word "her" starts as
``\\x01h\\x02\\x01e\\x02\\x01r\\x02``. Applying merge (a, b) is then ONE
literal (non-regex) replace of ``\\x01a\\x02\\x01b\\x02`` with
``\\x01ab\\x02`` — unambiguous (the brackets pin exact symbol
boundaries, so merging ("a","b") can never fire inside ["xa","b"]) and
engine-portable (literal `replace` scans left-to-right non-overlapping
in Spark and DuckDB alike, which is exactly Sennrich's replace-all-
occurrences step; for overlapping runs like "aaa" + merge (a,a) both
give ["aa","a"], the leftmost-greedy answer). Tokens come from
functions/text.py:tokens — letters/digits only — so the control-char
brackets can never collide with content.

Determinism contract: each round's winning pair is the (weighted count
DESC, pair ASC) total-order top-1, so two engines train the identical
merge list and the per-token symbol counts are exact integers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from etlutil_spark.operators.util import pin, pin_eager
from pyspark.sql import functions as F

from etlutil_spark.functions.text import tokens

SYM_L = "\x01"
SYM_R = "\x02"
PAIR_SEP = "\x03"


def bracketed_chars(tok: Column | str) -> Column:
    """token string -> its initial bracketed char segmentation."""
    t = F.col(tok) if isinstance(tok, str) else tok
    return F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.length(t)),
            lambda i: F.concat(F.lit(SYM_L), F.substring(t, i, 1), F.lit(SYM_R)),
        ),
        "",
    )


def _symbols(w: Column) -> Column:
    """bracketed segmentation -> array of symbols."""
    return F.split(F.substring(w, 2, F.length(w) - 2), SYM_R + SYM_L)


def merge_replace(w: Column, a: str, b: str) -> Column:
    """Apply one trained merge (a, b) -> ab to a bracketed segmentation."""
    return F.replace(
        w,
        F.lit(SYM_L + a + SYM_R + SYM_L + b + SYM_R),
        F.lit(SYM_L + a + b + SYM_R),
    )


def bpe_train_merges(
    df: DataFrame, text_col: str, *, k: int = 8
) -> list[tuple[str, str]]:
    """Train ``k`` BPE merges on ``df[text_col]``'s word vocabulary.

    Each round is ONE pair-count aggregate over the (checkpointed)
    vocabulary segmentation plus a 1-row deterministic top-1 collect —
    the bounded-driver-state idiom kmeans_fit uses; the driver holds k
    merge strings. Rounds stop early if no pair remains (every word
    fully merged)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    vocab = (
        df.where(F.col(text_col).isNotNull())
        .select(F.explode(tokens(text_col)).alias("tk"))
        .groupBy("tk")
        .agg(F.count("*").alias("c"))
    )
    # EAGER pin here, deliberately (r12 verdict item 5): the corpus-sized
    # tokenize+vocab aggregate materializes NOW, under AQE (skew handling
    # and partition coalescing matter for the one pass that scales with
    # data). Everything after this line is vocabulary-sized.
    seg = vocab.select(
        bracketed_chars("tk").alias("w"), F.col("c")
    ).transform(pin_eager)
    spark = df.sparkSession
    merges: list[tuple[str, str]] = []
    # AQE OFF for the k merge rounds: each round is one tiny vocab-keyed
    # exchange feeding a 1-row top-pair collect, and AQE schedules every
    # exchange as a job of its own (measured: 2 jobs/round with AQE, 1
    # without — identical winning pairs both ways; the round's lazy
    # re-segmentation pin rides the same job). AQE buys nothing on a
    # Heaps-small bounded exchange and costs k scheduled jobs per train.
    # Without AQE the rounds would fall back to the static
    # spark.sql.shuffle.partitions (mostly-empty tasks on a vocab-sized
    # exchange — measured: AQE-off alone REGRESSED wall), so the rounds'
    # partition count is derived from the pinned vocabulary's own
    # materialized partition count: scale-adaptive (grows with |vocab|,
    # 1 at tiny SF), not a constant tuned for either local mode or the
    # cluster. Session-scoped conf flips, restored in finally; the
    # trainer runs sequentially (no concurrent driver threads share
    # this session).
    nparts = max(1, seg.rdd.getNumPartitions())
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
    try:
        _train_rounds(seg, merges, k)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return merges


def _train_rounds(seg: DataFrame, merges: list[tuple[str, str]], k: int) -> None:
    for _ in range(k):
        syms = _symbols(F.col("w"))
        # The size>=2 guard must sit BELOW the explode projection: on a
        # 1-symbol word sequence(1, 0) is the descending [1, 0] and
        # element_at(syms, 0) is always an INVALID_INDEX error. Filtering
        # first makes the projected expression total by construction
        # instead of relying on Catalyst pushing the predicate under the
        # Generate (an optimizer rewrite, not a semantics guarantee).
        pairs = seg.where(F.size(syms) >= 2).select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(syms) - 1),
                    lambda j: F.concat(
                        F.element_at(syms, j),
                        F.lit(PAIR_SEP),
                        F.element_at(syms, j + 1),
                    ),
                )
            ).alias("pair"),
            "c",
        )
        top = (
            pairs.groupBy("pair")
            .agg(F.sum("c").cast("bigint").alias("wc"))
            .orderBy(F.col("wc").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["pair"].split(PAIR_SEP)
        merges.append((a, b))
        # checkpoint per round: truncates the growing replace-chain plan
        # AND materializes the new segmentation once (the kmeans /
        # duplicate_clusters iterative-Spark discipline); lazy, so the
        # materialization shares the next round's top-pair job
        seg = seg.select(
            merge_replace(F.col("w"), a, b).alias("w"), "c"
        ).transform(pin)


def bpe_segmentation(tok: Column | str, merges: list[tuple[str, str]]) -> Column:
    """token -> bracketed segmentation under the trained merges: the
    encode path, a pure literal-replace chain (zero joins/shuffles)."""
    w = bracketed_chars(tok)
    for a, b in merges:
        w = merge_replace(w, a, b)
    return w


def bpe_symbol_count(tok: Column | str, merges: list[tuple[str, str]]) -> Column:
    """token -> number of BPE symbols under the trained merges (the
    symbol count is the count of left brackets in the segmentation)."""
    w = bpe_segmentation(tok, merges)
    return (F.length(w) - F.length(F.replace(w, F.lit(SYM_L), F.lit("")))).cast(
        "bigint"
    )


def bpe_segmentation_table(
    df: DataFrame, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """(tk, seg, n_sym) over the distinct word vocabulary of
    ``df[text_col]`` — the LARGE-k encode path.

    The literal-replace chain (`bpe_segmentation`) is linear in merge
    count: at a production 32k-merge vocab it is a 32k-deep expression
    applied to EVERY corpus row. This path applies that chain exactly
    once per DISTINCT token — the Heaps'-law vocabulary, sub-linear in
    corpus size — and materializes the result as a table
    (localCheckpoint severs the k-deep expression from downstream
    plans). Corpus encoding then becomes one tk-keyed equi-join
    (`bpe_encode_join`): cost independent of k at scan time.

    Crossover: for small k the replace chain is cheaper (no join); for
    large k the vocab table wins because the chain runs |vocab| times
    instead of |corpus| times. Both paths provably agree
    (tests/test_bpe.py pins vocab-encode == literal-replace encode on
    the same trained merges)."""
    vocab = (
        df.where(F.col(text_col).isNotNull())
        .select(F.explode(tokens(text_col)).alias("tk"))
        .distinct()
    )
    seg = bpe_segmentation(F.col("tk"), merges)
    out = vocab.select(
        "tk",
        seg.alias("seg"),
        (
            F.length(seg) - F.length(F.replace(seg, F.lit(SYM_L), F.lit("")))
        )
        .cast("bigint")
        .alias("n_sym"),
    )
    # sever the k-deep replace chain: downstream consumers see a plain
    # 3-column table, not a re-derivable expression tree (lazy: computed
    # once at the first consumer's action instead of in a job of its own)
    return out.transform(pin)


def bpe_encode_join(
    tok_df: DataFrame, seg_table: DataFrame, *, tok_col: str = "tk"
) -> DataFrame:
    """Price each corpus token at its trained symbol count via ONE
    tk-keyed equi-join against the segmentation table — no replace
    chain touches the corpus.

    No broadcast hint on purpose: at test SF the planner broadcasts the
    KB-scale vocab table on its own statistics; at 100 TB a Heaps'-law
    vocabulary can reach 1e8+ rows and the same statistics keep the
    shuffle join — the stats-driven self-correction the winnowing
    fp-join pins in tests/test_plan_quality.py."""
    return tok_df.join(
        seg_table.withColumnRenamed("tk", tok_col), tok_col, "inner"
    )
