"""Benchmark decontamination: find training docs that overlap an eval set.

The standard contamination check (GPT-3 appendix C / PaLM / Llama style)
flags a training document when it shares at least ``min_shared`` distinct
word n-grams with any document of a benchmark/eval corpus.

Scale shape — the asymmetry is the whole design: the eval side is small
(benchmarks are thousands of docs, the training corpus is billions), so
the eval shingle set is BROADCAST and the check becomes a map-side
semi-ish join on the training shingle stream:

  train docs -> explode distinct shingles     (the only big intermediate)
             -> broadcast-join eval shingles  (no shuffle of train data)
             -> per-train-doc distinct count  (one shuffle on doc_id)

No train-side self-join exists anywhere, and the one shuffle is keyed by
training doc id (uniform — no skew). At 100 TB of training text this is
a single pass; the alternative (shuffle-joining two shingle tables)
would move the training corpus's entire shingle inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from etlutil_spark.operators.util import pin
from pyspark.sql import functions as F

from etlutil_spark.operators.dedup import shingle_table


def contaminated_docs(
    train: DataFrame,
    eval_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_shared: int = 2,
) -> DataFrame:
    """(train doc_id, n_shared) for every training doc sharing >=
    ``min_shared`` distinct ``n``-gram shingles with the eval corpus.

    ``n_shared`` counts distinct shingles that appear anywhere in the
    eval set (union semantics — matching five eval docs on the same
    shingle counts once: the signal is "seen in eval", not "how many
    eval docs")."""
    t_sh = shingle_table(train, id_col, text_col, n)
    e_sh = (
        shingle_table(eval_df, id_col, text_col, n)
        .select("shingle")
        .distinct()
    )
    # count(*) == count_distinct(shingle) here BY CONSTRUCTION: shingle_table
    # emits per-doc distinct shingles (array_distinct before the explode) and
    # the join key set e_sh is distinct, so (id, shingle) multiplicity is 1.
    # A distinct-count aggregate plans an extra Expand + Exchange pair; the
    # plain count needs ONE shuffle keyed by doc id (guide §2.4).
    return (
        t_sh.join(F.broadcast(e_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def contamination_coverage(
    train: DataFrame,
    eval_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Span-coverage contamination (the Llama-style refinement of the
    shared-shingle count): for each contaminated training doc, the
    FRACTION of its token positions covered by at least one n-gram that
    appears anywhere in the eval corpus. A doc that shares two
    incidental trigrams and a doc that embeds a whole eval answer both
    pass ``min_shared=2``; coverage separates them (0.02 vs 0.9), which
    is what a removal threshold should key on.

    Returns ``(id_col, n_tokens, n_covered, coverage)`` for docs with
    any coverage. Same asymmetry as :func:`contaminated_docs`: eval
    shingles broadcast, the train side is never shuffled before the
    match. A matched n-gram explodes into its n covered positions
    (bounded n-fold blowup of MATCHES only, not of the corpus), the
    per-doc distinct-position count is one aggregate keyed by train doc
    id. At the scale where even eval shingles strain the broadcast,
    screen first with the Bloom bitset (:func:`bloom_contaminated_docs`
    stage 1) and feed the candidates here."""
    from etlutil_spark.functions.text import tokens

    e_sh = (
        shingle_table(eval_df, id_col, text_col, n)
        .select("shingle")
        .distinct()
    )
    t = (
        train.select(F.col(id_col), tokens(text_col).alias("_tk"))
        .where(F.size("_tk") > 0)
        .transform(pin)
    )
    grams = (
        t.where(F.size("_tk") >= n)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("_tk") - n),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.concat_ws(" ", F.slice("_tk", i + 1, n)).alias(
                            "shingle"
                        ),
                    ),
                )
            ).alias("_g"),
        )
        .select(id_col, "_g.pos", "_g.shingle")
    )
    covered = (
        grams.join(F.broadcast(e_sh), "shingle")
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias(
                "_cp"
            ),
        )
        .distinct()
        .groupBy(id_col)
        .agg(F.count("*").cast("bigint").alias("n_covered"))
    )
    totals = t.select(F.col(id_col), F.size("_tk").cast("bigint").alias("n_tokens"))
    return totals.join(covered, id_col).select(
        id_col,
        "n_tokens",
        "n_covered",
        (F.col("n_covered") / F.col("n_tokens")).alias("coverage"),
    )


def bloom_contaminated_docs(
    train: DataFrame,
    eval_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_shared: int = 2,
    bits_per_element: int = 16,
    n_hashes: int = 4,
) -> DataFrame:
    """Bloom-screened decontamination: same answer as
    :func:`contaminated_docs` (the exact-verify stage guarantees zero
    false positives, and a Bloom filter has no false negatives by
    construction), but built for the scale where even the distinct eval
    shingle set is too big to broadcast comfortably.

    Two stages, the LSH candidate-only pattern:

      1. SCREEN (map-side): broadcast a bitset of ``bits_per_element``
         bits per eval shingle (~2 bytes/element at the default 16 —
         10-50x smaller than broadcasting the shingle strings) and keep
         only train shingles whose ``n_hashes`` salted-xxhash64 bits are
         all set. Everything here is whole-stage-codegen column
         arithmetic (shift/AND on an array<bigint>); clean train
         shingles — the overwhelming majority — die in place, shuffling
         nothing.
      2. VERIFY (tiny shuffle): equi-join the surviving candidates
         (true hits + the ~0.2% Bloom false positives at 16 bits/elem,
         k=4) against the exact eval shingle set. Because stage 1
         already shrank the train side, neither join input needs a
         broadcast — the shuffle carries candidates only.

    The eval shingle frame feeds both the filter build and the verify
    join, so it is checkpointed and its count (one bounded action on the
    small-by-design eval side) sizes the bitset."""
    e_sh = (
        shingle_table(eval_df, id_col, text_col, n)
        .select("shingle")
        .distinct()
        .transform(pin)
    )
    n_elems = max(e_sh.count(), 1)
    m_words = max((n_elems * bits_per_element + 63) // 64, 1)
    m_bits = m_words * 64

    def bit_pos(i: int) -> F.Column:
        return F.pmod(F.xxhash64(F.lit(i), F.col("shingle")), F.lit(m_bits))

    words = (
        e_sh.select(
            F.explode(
                F.array(*[bit_pos(i) for i in range(n_hashes)])
            ).alias("bit")
        )
        .select(
            (F.col("bit") / 64).cast("int").alias("w"),
            F.expr("shiftleft(1L, cast(bit % 64 as int))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
    )
    filt = words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("_m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(m_words - 1)),
            lambda i: F.coalesce(F.element_at(F.col("_m"), i), F.lit(0)),
        ).alias("bf")
    )

    def might_contain(i: int) -> F.Column:
        pos = bit_pos(i)
        word = F.element_at(F.col("bf"), (pos / 64).cast("int") + 1)
        mask = F.expr(
            f"shiftleft(1L, cast(pmod(xxhash64({i}, shingle), {m_bits})"
            " % 64 as int))"
        )
        return word.bitwiseAND(mask) != 0

    cond = might_contain(0)
    for i in range(1, n_hashes):
        cond = cond & might_contain(i)
    candidates = (
        shingle_table(train, id_col, text_col, n)
        .crossJoin(F.broadcast(filt))
        .where(cond)
        .select(id_col, "shingle")
    )
    # same invariant as contaminated_docs: candidates carries per-doc
    # distinct shingles and e_sh is distinct, so count(*) == count_distinct
    # and the Expand + extra Exchange of a distinct aggregate are avoidable
    return (
        candidates.join(e_sh, "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
