"""Column profile on a hand-built frame: null counts, exact distincts,
native-typed (not lexicographic) numeric min/max."""

from __future__ import annotations

from graphdb_td2_spark.functions.profile import column_profile


def test_column_profile_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (10, "b"), (None, "a")],
        "k long, v string",
    )
    got = {r.col_name: r for r in column_profile(df, ["k", "v"]).collect()}
    k, v = got["k"], got["v"]
    assert (k.n_rows, k.n_nulls, k.n_distinct) == (4, 1, 3)
    # native numeric ordering: min 1, max 10 (lexicographic would say "10" < "2")
    assert (k.min_value, k.max_value) == ("1", "10")
    assert (v.n_rows, v.n_nulls, v.n_distinct) == (4, 1, 2)
    assert (v.min_value, v.max_value) == ("a", "b")
