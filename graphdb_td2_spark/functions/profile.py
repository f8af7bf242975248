"""Column profiling — the data-quality pass every ingest runs before a
corpus is trusted: per-column null counts, exact distinct cardinality,
and min/max, in ONE scan.

Shape: a single aggregate computes all per-column statistics as one row
(Catalyst evaluates the 4·k aggregates in a single pass with partial
aggregation — k separate per-column queries would scan the table k
times), then ``stack`` unpivots to one row per column. Values are
surfaced as strings (cast AFTER the native-typed min/max, so numeric
columns order numerically, not lexicographically).

Exactness: counts are integers; min/max of long/string columns cast to
string identically in both engines (binary collation, no float or
timestamp formatting in play for the profiled column set), so the
profile is oracle-checked exactly — `approx_count_distinct` would be the
100 TB variant, deliberately not used here because the contract is the
exact profile (the sketch tier lives in ``functions/sketches.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import read_table

PROFILE_COLUMNS = ("doc_id", "lang", "source", "n_chars", "text")


def column_profile(df: DataFrame, columns: list[str]) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_value, max_value) — one
    row per profiled column, one scan over ``df``."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs.extend(
            [
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("long")
                .alias(f"__nulls_{c}"),
                F.count_distinct(F.col(c)).alias(f"__dist_{c}"),
                F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
                F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
            ]
        )
    one = df.agg(*aggs)
    stack = F.expr(
        "stack({n}, {args}) as (col_name, n_nulls, n_distinct, min_value, max_value)".format(
            n=len(columns),
            args=", ".join(
                f"'{c}', __nulls_{c}, __dist_{c}, __min_{c}, __max_{c}"
                for c in columns
            ),
        )
    )
    return one.select(F.col("__n").alias("n_rows"), stack).select(
        "col_name", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value"
    )


def documents_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: the exact column profile of ``documents``."""
    docs = read_table(spark, sf_dir, "documents", list(PROFILE_COLUMNS))
    return column_profile(docs, list(PROFILE_COLUMNS)).orderBy("col_name")


def dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(metric, value)`` — the corpus datasheet a
    training run records next to its config: document/source/language
    counts, exact character and whitespace-token totals, and the
    exact-duplicate count (normalized-digest distinct). One bounded
    output a model card embeds verbatim. Ordered by metric.

    All integer metrics from TWO passes (one scan-side conditional agg
    + one digest distinct) — the cheap summary tier; the deep per-
    capability numbers live in the dedicated operators this card
    composes (documents_profile, exact_dedup_stats, token_stats).
    """
    from ..dedup.exact import content_digest
    from .text import tokens_col

    docs = read_table(spark, sf_dir, "documents", ["doc_id", "text", "lang", "source"])
    base = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        F.sum(F.size(tokens_col(F.col("text")))).cast("long").alias("total_tokens"),
        (F.count(F.lit(1)) - F.countDistinct(content_digest(F.col("text"))))
        .cast("long")
        .alias("n_exact_dups"),
    )
    return base.select(
        F.expr(
            "stack(6,"
            " 'n_docs', n_docs,"
            " 'n_exact_dups', n_exact_dups,"
            " 'n_langs', n_langs,"
            " 'n_sources', n_sources,"
            " 'total_chars', total_chars,"
            " 'total_tokens', total_tokens"
            ") AS (metric, value)"
        )
    ).orderBy("metric")
