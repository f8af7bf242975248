"""Blocking + edit-distance record linkage (dedup/er.py)."""

from __future__ import annotations

import pytest

from graphdb_td2_spark.dedup import er
from graphdb_td2_spark.dedup.er import fuzzy_part_matches


def _write_parts(spark, path, rows):
    df = spark.createDataFrame(rows, "p_partkey long, p_name string, p_brand string")
    df.write.mode("overwrite").parquet(f"{path}/part.parquet")


@pytest.fixture(scope="module")
def er_dir(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("er"))
    _write_parts(
        spark,
        root,
        [
            # block Brand#1|red: pairwise distances are small and known
            (1, "red bolt", "Brand#1"),
            (2, "red bolts", "Brand#1"),   # dist(bolt, bolts)=1
            (3, "red gear", "Brand#1"),    # dist(bolt, gear)=4
            # different first token → different block, never matched
            (4, "blue bolt", "Brand#1"),
            # different brand → different block
            (5, "red bolt", "Brand#2"),
        ],
    )
    return root


def test_known_distances_and_ranks(spark, er_dir):
    out = {
        (r["p_partkey"], r["match_partkey"]): (r["rank"], r["distance"])
        for r in fuzzy_part_matches(spark, er_dir).collect()
    }
    # part 1 matches 2 (dist 1) then 3 (dist 4); never 4 or 5 (other blocks)
    assert out[(1, 2)] == (1, 1)
    assert out[(1, 3)] == (2, 4)
    assert (1, 4) not in out and (1, 5) not in out
    # symmetric direction exists with its own ranking
    assert out[(2, 1)][1] == 1
    # no self matches
    assert all(a != b for a, b in out)


def test_max_distance_filters(spark, er_dir):
    out = fuzzy_part_matches(spark, er_dir, max_distance=1).collect()
    got = {(r["p_partkey"], r["match_partkey"]) for r in out}
    assert got == {(1, 2), (2, 1)}


def test_degenerate_block_dropped(spark, tmp_path_factory, monkeypatch):
    root = str(tmp_path_factory.mktemp("er_cap"))
    rows = [(i, "red bolt", "Brand#1") for i in range(5)] + [
        (100, "hot gear", "Brand#2"),
        (101, "hot gears", "Brand#2"),
    ]
    _write_parts(spark, root, rows)
    monkeypatch.setattr(er, "BLOCK_CAP", 3)
    out = fuzzy_part_matches(spark, root).collect()
    # the 5-row block exceeds the cap and is dropped wholesale; the small
    # block survives
    keys = {r["p_partkey"] for r in out}
    assert keys == {100, 101}


def test_corpus_contract(spark, sf_dir):
    rows = fuzzy_part_matches(spark, sf_dir).collect()
    assert all(1 <= r["rank"] <= er.TOPK_MATCHES for r in rows)
    # distance 0 is legal: distinct parts can share a name
    assert all(0 <= r["distance"] <= er.MAX_DISTANCE for r in rows)
    per_part = {}
    for r in rows:
        per_part.setdefault(r["p_partkey"], []).append((r["rank"], r["distance"]))
    for ranked in per_part.values():
        ranked.sort()
        assert [d for _, d in ranked] == sorted(d for _, d in ranked)
