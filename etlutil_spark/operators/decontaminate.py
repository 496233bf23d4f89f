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
    return (
        t_sh.join(F.broadcast(e_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count_distinct("shingle").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
