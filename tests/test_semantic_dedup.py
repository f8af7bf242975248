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


def test_cell_cap_is_noop_at_oracle_scale(spark, sf_dir):
    """SEM_CELL_CAP exceeds every cell at the oracle scales, so the
    capped prune must be byte-identical to the uncapped one there (the
    EMB_BLOCK_CAP invariance discipline) — and the cap constant must
    actually clear the largest observed cell."""
    from graphdb_td2_spark.dedup.semantic import SEM_CELL_CAP

    assigned = semantic_cells(spark, sf_dir).persist()
    max_cell = (
        assigned.groupBy("cell").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_cell <= SEM_CELL_CAP, (
        f"largest cell {max_cell} exceeds SEM_CELL_CAP {SEM_CELL_CAP} — "
        "the cap is no longer a no-op at oracle scale"
    )
    capped = set(
        (r["cell"], r["vec_id"]) for r in semantic_dropped(assigned).collect()
    )
    uncapped = set(
        (r["cell"], r["vec_id"])
        for r in semantic_dropped(assigned, cell_cap=1 << 30).collect()
    )
    assigned.unpersist()
    assert capped == uncapped


def test_cell_cap_semantics_adversarial(spark):
    """Pin the capped-panel semantics at the boundary: only the cap
    lowest-id cell members are drop WITNESSES, but every member stays
    drop-ELIGIBLE. Cell layout (cap=4): ids 0-3 mutually orthogonal
    (the panel), id 4 a duplicate of id 0 (dropped — witness in panel),
    id 5 a duplicate of id 4 but orthogonal to the panel (NOT dropped —
    its only witness sits beyond the cap)."""
    axis = lambda i: [1_000_000 if j == i else 0 for j in range(64)]  # noqa: E731
    rows = [
        (0, 0, axis(0)),
        (1, 0, axis(1)),
        (2, 0, axis(2)),
        (3, 0, axis(3)),
        (4, 0, axis(0)),  # dup of panel member 0 -> dropped
        (5, 0, axis(4)),  # orthogonal to panel; dup of non-panel 5? no:
        (6, 0, axis(4)),  # dup of id 5, which is OUTSIDE the panel -> kept
    ]
    assigned = spark.createDataFrame(
        rows, "vec_id long, cell long, qe array<long>"
    )
    dropped = sorted(
        r["vec_id"]
        for r in semantic_dropped(assigned, threshold=0.99, cell_cap=4).collect()
    )
    assert dropped == [4], dropped
    # uncapped: id 6 is also dropped (witness id 5 now eligible)
    dropped_full = sorted(
        r["vec_id"]
        for r in semantic_dropped(assigned, threshold=0.99, cell_cap=100).collect()
    )
    assert dropped_full == [4, 6], dropped_full
