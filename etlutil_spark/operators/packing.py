"""Sequence packing: group documents into token-budget bins.

Training pipelines concatenate documents into fixed-length sequences
(e.g. 4096-token windows); the planning half of that job — deciding WHICH
docs share a bin — is a pure data transform that must scale and be
deterministic. Optimal bin packing is NP-hard and inherently sequential;
the distributed-friendly standard is NEXT-FIT over a deterministic
order: sort the stream (within a group), take a running token total, and
cut a new pack every time the total crosses the budget.

Spark shape: one window (running sum over docs ordered by id within the
group) — a single shuffle on the group key, exactly the sessionization
cost profile. Documents are never split (splitting/truncating belongs to
the tokenizer stage downstream).

The cut rule is ``pack_id = floor((cumsum - n_tokens) / budget)``: a doc
opens at offset (cumsum - n_tokens) and joins the pack that offset falls
in, and every engine with window functions reproduces the assignment
bit-for-bit (DuckDB oracle twin). Consequences of the offset rule worth
knowing: a pack can exceed the budget by the tail of whichever doc
straddles its boundary (for an over-budget doc that tail is the whole
overshoot — it joins the pack its offset falls in, which may already
hold smaller docs), and pack ids within a group may skip values after an
oversized doc (ids are stable bucket labels, not a dense sequence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etlutil_spark.functions.text import token_count


def pack_by_token_budget(
    df: DataFrame,
    budget: int,
    *,
    group_col: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Assign each doc a ``pack_id`` so consecutive docs (by ``id_col``
    within ``group_col``) share a pack until ``budget`` tokens is crossed.

    Pass ``n_tokens_col`` to reuse a precomputed token count; otherwise
    the whitespace/punct tokenizer (functions/text.py) counts inline.
    Returns the input plus (n_tokens, pack_id, pack_offset).

    A NULL text (or a NULL/negative precomputed count) raises a named
    error at execution: Spark's non-ANSI ``size(NULL)`` is -1, which
    would silently SUBTRACT from the running cumsum and shift every
    later doc's pack assignment in the group."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    # output-name collisions fail loudly — EXCEPT the legitimate
    # "reuse my precomputed n_tokens column under its own name" call
    # (n_tokens_col == "n_tokens"), where the overwrite is the identity
    owned = ["pack_offset", "pack_id"] + (
        [] if n_tokens_col == "n_tokens" else ["n_tokens"]
    )
    for scratch in owned:
        if scratch in df.columns:
            raise ValueError(
                f"pack_by_token_budget: input already has a '{scratch}' "
                "column — rename it; the packer owns that output name"
            )
    raw_tok = F.col(n_tokens_col) if n_tokens_col else token_count(text_col)
    bad = raw_tok.isNull() | (raw_tok < 0)
    if n_tokens_col:
        # a NaN in a float-typed count passes both isNull and <0 (NaN < 0
        # is false) yet still corrupts the running cumsum — guard it too
        try:
            dt = df.schema[n_tokens_col].dataType.simpleString()
        except Exception:  # absent column: let Spark's analyzer report it
            dt = ""
        if dt in ("float", "double"):
            bad = bad | F.isnan(raw_tok)
    n_tok = F.when(
        bad,
        F.raise_error(
            F.lit(
                "pack_by_token_budget: NULL, NaN or negative token count "
                f"(NULL {'in ' + n_tokens_col if n_tokens_col else 'text'}?) "
                "— filter or impute upstream; a -1/NULL count would "
                "silently corrupt the running pack offsets"
            )
        ).cast("int"),
    ).otherwise(raw_tok).alias("n_tokens")
    keys = [group_col] if group_col else []
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_tok = df.withColumn("n_tokens", n_tok)
    cum = F.sum("n_tokens").over(w)
    offset = (cum - F.col("n_tokens")).alias("pack_offset")
    return with_tok.select(
        "*",
        offset,
        F.floor((cum - F.col("n_tokens")) / F.lit(budget)).alias("pack_id"),
    )


def pack_stats(packed: DataFrame, *, group_col: str | None = None) -> DataFrame:
    """Per-pack summary (doc count, token total, budget utilization input):
    one aggregate over the packing keys."""
    keys = ([group_col] if group_col else []) + ["pack_id"]
    return packed.groupBy(*keys).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.min("pack_offset").alias("start_offset"),
    )


def length_grouped_batches(
    df: DataFrame,
    len_col: str,
    id_col: str,
    *,
    batch_size: int = 32,
) -> DataFrame:
    """Length-grouped batch assignment: globally rank documents by
    (length, id) and cut fixed-count batches of ``batch_size`` — the
    padding-waste minimizer every training dataloader ships (a batch is
    padded to its longest member, so batching SIMILAR lengths turns
    O(spread) waste into near-zero).

    Adds ``batch_id`` (0-based) and ``rank``. The global length order
    does NOT sort through one task: the rank is exact_cumsum's
    parallel-ranking recipe (range repartition on (len, id) +
    per-partition counts + exact driver prefix offsets broadcast back —
    operators/quantiles.py), so the assignment is deterministic AND
    distributed at any scale. The last batch may be short; batch_id is
    dense. Downstream per-batch padding cost is
    batch_size * max(len) - sum(len) (see docs_length_batching for the
    sorted-vs-hashed savings readout)."""
    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    from etlutil_spark.operators.quantiles import exact_cumsum

    ranked = exact_cumsum(
        df.withColumn("_one", F.lit(1)),
        "_one",
        [len_col, id_col],
        cumsum_col="rank",
    ).drop("_one")
    return ranked.withColumn(
        "batch_id",
        ((F.col("rank") - 1) / F.lit(batch_size)).cast("bigint"),
    )
