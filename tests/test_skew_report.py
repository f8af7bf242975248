"""Join-key skew diagnostic (operators/quality_checks.py:
join_key_skew_report) — accounting invariants against direct recounts."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_td2_spark.io import read_table
from graphdb_td2_spark.operators.quality_checks import (
    SKEW_KEYS,
    join_key_skew_report,
)


def test_skew_report_matches_direct_recounts(spark, sf_dir):
    rows = {r["join_key"]: r for r in join_key_skew_report(spark, sf_dir).collect()}
    assert set(rows) == {f"{t}.{k}" for t, k in SKEW_KEYS}
    for table, key in SKEW_KEYS:
        r = rows[f"{table}.{key}"]
        df = read_table(spark, sf_dir, table, [key])
        counts = df.groupBy(key).count()
        assert r["n_rows"] == df.count()
        assert r["n_keys"] == counts.count()
        top = counts.filter(F.col(key) == r["top_key"]).collect()
        assert len(top) == 1 and top[0]["count"] == r["max_key_rows"]
        # ratio >= 1000 by construction (max >= mean), never truncated under
        assert r["skew_ratio_fp"] >= 1000
        assert (
            r["skew_ratio_fp"]
            == r["max_key_rows"] * r["n_keys"] * 1000 // r["n_rows"]
        )
