"""SemDeDup (dedup/semantic.py): accounting invariants on the real corpus,
and the keep-policy proven on a planted-duplicate fixture — exact duplicates
must collapse to exactly one keeper (the lowest id), whatever cell k-means
puts them in."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_td2_spark.dedup.semantic import (
    semantic_cells,
    semantic_dedup_stats,
    semantic_dropped,
)
from graphdb_td2_spark.io import read_table
from graphdb_td2_spark.similarity.ann import N_CELLS


def test_cell_accounting(spark, sf_dir):
    stats = semantic_dedup_stats(spark, sf_dir).collect()
    n_emb = read_table(spark, sf_dir, "embeddings", ["vec_id"]).count()
    assert sum(r["n_vecs"] for r in stats) == n_emb  # partition, no loss
    assert len(stats) <= N_CELLS
    for r in stats:
        assert r["n_dropped"] + r["n_kept"] == r["n_vecs"]
        assert r["n_kept"] >= 1  # the lowest id in a cell is never dropped


def test_dropped_have_lower_id_witness(spark, sf_dir):
    """Every dropped vector must have a lower-id vector in the SAME cell
    (the witness that justified dropping it)."""
    assigned = semantic_cells(spark, sf_dir)
    dropped = semantic_dropped(assigned).collect()
    min_per_cell = {
        r["cell"]: r["m"]
        for r in assigned.groupBy("cell").agg(F.min("vec_id").alias("m")).collect()
    }
    assert dropped, "corpus has planted near-dups; expect a non-empty prune"
    for r in dropped:
        assert r["vec_id"] > min_per_cell[r["cell"]]


def test_exact_duplicates_collapse_to_one_keeper(spark, sf_dir, tmp_path):
    """Planted fixture: 3 identical vectors + distinct fillers. The
    identical triple lands in one cell (cosine 1.0 with itself beats any
    other centroid identically for all three) and the prune keeps exactly
    the lowest id of the three."""
    import pandas as pd

    dup = [1.0] * 32 + [0.0] * 32
    fillers = []
    for i in range(13):
        v = [0.0] * 64
        v[i % 64] = 1.0
        v[(i * 7 + 3) % 64] = -1.0
        fillers.append(v)
    vecs = [dup, dup, dup] + fillers
    pdf = pd.DataFrame(
        {
            "vec_id": list(range(len(vecs))),
            "embedding": [[float(x) for x in v] for v in vecs],
            "label": ["x"] * len(vecs),
        }
    )
    path = str(tmp_path / "fixture")
    spark.createDataFrame(pdf).write.parquet(f"{path}/embeddings.parquet")
    stats = semantic_dedup_stats(spark, path, n_cells=4, n_iter=2, threshold=0.99)
    dropped_total = sum(r["n_dropped"] for r in stats.collect())
    assert dropped_total == 2  # vec 1 and vec 2; vec 0 is the keeper
    assigned = semantic_cells(spark, path, n_cells=4, n_iter=2)
    d = semantic_dropped(assigned, threshold=0.99)
    assert sorted(r["vec_id"] for r in d.collect()) == [1, 2]
