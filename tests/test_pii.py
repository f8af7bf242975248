"""PII scan + redaction on a planted fixture (the driver corpus is clean,
so the oracle query exercises the zero path; this exercises the hits)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_td2_spark.functions.pii import pii_scan_stats, redact_pii


def _docs(spark, tmp_path):
    rows = [
        (1, "s1", "contact bob.smith+x@corp.example.com or 555-123-4567 now"),
        (2, "s1", "ssn 123-45-6789 leaked from 10.0.0.1 and 192.168.1.255"),
        (3, "s2", "totally clean text with no identifiers at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    df = df.withColumn("lang", F.lit("en")).withColumn(
        "n_chars", F.length("text").cast("long")
    )
    df.write.parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_pii_scan_counts(spark, tmp_path):
    path = _docs(spark, tmp_path)
    got = {r.source: r for r in pii_scan_stats(spark, path).collect()}
    s1, s2 = got["s1"], got["s2"]
    assert (s1.docs_with_email, s1.email_hits) == (1, 1)
    assert (s1.docs_with_phone, s1.phone_hits) == (1, 1)
    assert (s1.docs_with_ssn, s1.ssn_hits) == (1, 1)
    assert (s1.docs_with_ipv4, s1.ipv4_hits) == (1, 2)
    assert s2.n_docs == 1
    assert (
        s2.docs_with_email + s2.docs_with_phone + s2.docs_with_ssn + s2.docs_with_ipv4
        == 0
    )


def test_redaction_removes_every_hit(spark, tmp_path):
    path = _docs(spark, tmp_path)
    from graphdb_td2_spark.io import read_table

    docs = read_table(spark, path, "documents", ["doc_id", "text"])
    red = docs.select("doc_id", redact_pii(F.col("text")).alias("text"))
    texts = {r.doc_id: r.text for r in red.collect()}
    assert texts[1] == "contact <EMAIL> or <PHONE> now"
    assert texts[2] == "ssn <SSN> leaked from <IP> and <IP>"
    assert texts[3] == "totally clean text with no identifiers at all"
    # re-scanning redacted text finds nothing
    red_docs = red.withColumn("source", F.lit("r")).withColumn(
        "lang", F.lit("en")
    ).withColumn("n_chars", F.length("text").cast("long"))
    red_docs.write.parquet(f"{path}/redacted/documents.parquet")
    stats = pii_scan_stats(spark, f"{path}/redacted").collect()[0]
    assert stats.email_hits + stats.phone_hits + stats.ssn_hits + stats.ipv4_hits == 0
