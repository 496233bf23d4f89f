"""Document-level text analysis for training-data pipelines.

Profiles a text column in ONE projection (no shuffle): token stats,
quality heuristics, language ID, content fingerprint. All built on the
SQL-portable column functions in functions.text, so the whole profile
carries a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etlutil_spark.functions import text as X


def profile_documents(
    df: DataFrame, text_col: str = "text", *, lang_hint_col: str | None = None
) -> DataFrame:
    """Append the full text-analysis profile to each row.

    Columns added: n_tokens, n_chars_text, est_bpe_tokens, alpha_ratio,
    mean_word_len, stopword_ratio_en, quality, lang_pred, fingerprint.

    Tokenization happens ONCE (shared ``pre_tokens`` column): codegen size
    scales with the expression tree, and nine statistics each carrying
    their own tokenizer copy made compile time, not row work, the cost."""
    tk = df.withColumn("__tk", X.tokens(text_col))
    out = tk.withColumns(
        {
            "n_tokens": X.token_count(text_col, pre_tokens="__tk"),
            "n_chars_text": X.char_count(text_col),
            "est_bpe_tokens": X.bpe_ish_token_count(text_col, pre_tokens="__tk"),
            "alpha_ratio": F.round(X.alpha_ratio(text_col), 6),
            "mean_word_len": F.round(
                X.mean_word_len(text_col, pre_tokens="__tk"), 6
            ),
            "stopword_ratio_en": F.round(
                X.stopword_ratio(text_col, "en", pre_tokens="__tk"), 6
            ),
            "quality": X.quality_score(text_col, pre_tokens="__tk"),
            "lang_pred": X.lang_id(text_col, pre_tokens="__tk"),
            "fingerprint": X.doc_fingerprint(text_col),
        }
    )
    return out.drop("__tk")


def language_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Predicted-language distribution (lang_pred, n_docs)."""
    return (
        df.select(X.lang_id(text_col).alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count("*").alias("n_docs"))
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_tokens: int = 10,
    min_quality: float = 0.3,
) -> DataFrame:
    """Keep documents passing the quality gate — the canonical pre-training
    corpus filter; a pure pushdown-friendly predicate."""
    return df.where(
        (X.token_count(text_col) >= min_tokens)
        & (X.quality_score(text_col) >= min_quality)
    )
