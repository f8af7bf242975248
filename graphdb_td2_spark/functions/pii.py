"""PII scanning and redaction — the compliance pass of a training-data
pipeline (scan → quantify → redact before anything ships to a trainer).

Patterns are deliberately restricted to the regex subset with IDENTICAL
semantics in Java's engine (Spark), RE2 (DuckDB) and PCRE: character
classes, bounded quantifiers, alternation, word boundaries — no backrefs,
no lookaround. That keeps the scan oracle-exact across engines, which is
how the counts are verified (``pii_scan_stats``).

Scale notes: everything is ``regexp_extract_all`` / ``regexp_replace``
built-ins — JVM-side, whole-stage-codegen'd, no UDFs; the stats query is
one narrow scan plus a per-source partial-aggregated rollup. Redaction is
a pure column transform usable inside any write pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..io import read_table

# name → (pattern, replacement token). Order matters for redaction: the
# email pattern must run before the phone/ip digit patterns can nibble at
# its local part.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def pii_hit_count(text: Column, kind: str) -> Column:
    """Number of matches of one PII pattern in ``text`` (long)."""
    pattern, _ = PII_PATTERNS[kind]
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0))).cast("long")


def redact_pii(text: Column) -> Column:
    """``text`` with every PII pattern replaced by its placeholder token.
    SSN runs before phone (a dashed SSN also matches no phone pattern here,
    but keep the declared order deterministic)."""
    out = text
    for _, (pattern, token) in PII_PATTERNS.items():
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_scan_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII exposure over ``documents``: documents containing
    and total occurrences of each pattern class."""
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "source", "text"])
    per_doc = docs.select(
        "source",
        *[
            pii_hit_count(F.col("text"), kind).alias(f"__{kind}")
            for kind in PII_PATTERNS
        ],
    )
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for kind in PII_PATTERNS:
        aggs.append(
            F.sum(F.when(F.col(f"__{kind}") > 0, 1).otherwise(0))
            .cast("long")
            .alias(f"docs_with_{kind}")
        )
        aggs.append(F.sum(f"__{kind}").alias(f"{kind}_hits"))
    return per_doc.groupBy("source").agg(*aggs).orderBy("source")
