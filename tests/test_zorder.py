"""Z-order key correctness (vs a pure-Python interleave) and the layout
property it exists for: per-file min/max ranges stay tight on BOTH
columns, unlike a plain lexicographic sort."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_td2_spark.functions.zorder import morton_key, write_zordered


def _py_morton(x: int, y: int, bits: int = 21) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_morton_matches_python_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (1, 1), (5, 3), (1023, 511), (2**20, 2**20 - 1)]
    df = spark.createDataFrame(rows, "x long, y long").select(
        "x", "y", morton_key(F.col("x"), F.col("y")).alias("z")
    )
    for r in df.collect():
        assert r["z"] == _py_morton(r["x"], r["y"]), (r["x"], r["y"])


def test_zorder_layout_tightens_both_columns(spark, tmp_path):
    import pathlib

    # 64x64 grid — under Z-order each of 8 files owns a compact curve
    # segment; under an x-major sort each file spans ALL y values
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    zpath = str(tmp_path / "zordered")
    write_zordered(grid, zpath, "x", "y")

    def per_file_y_spread(path):
        df = spark.read.parquet(path).withColumn(
            "f", F.input_file_name()
        )
        rows = (
            df.groupBy("f")
            .agg((F.max("y") - F.min("y")).alias("spread"))
            .collect()
        )
        return sum(r["spread"] for r in rows) / len(rows)

    lpath = str(tmp_path / "xmajor")
    (
        grid.repartitionByRange(8, "x")
        .sortWithinPartitions("x", "y")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    z_spread = per_file_y_spread(zpath)
    l_spread = per_file_y_spread(lpath)
    # x-major files each cover (almost) the full y range (~63); the Z-curve
    # keeps y spans fractional
    assert z_spread < l_spread * 0.6, (z_spread, l_spread)
    assert len(list(pathlib.Path(zpath).glob("*.parquet"))) >= 2
