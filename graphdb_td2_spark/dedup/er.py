"""Entity resolution / fuzzy record matching over ``part`` [extension]:
blocking + edit-distance candidate ranking — the classic record-linkage
shape (block on cheap deterministic keys to kill the O(n²) cross product,
then score only intra-block pairs with an expensive string distance).

No reference counterpart (the reference joins only on exact FKs); this is
the record-dedup member of the LLM-pipeline dedup tier — the same
block→pair→score→keep skeleton as MinHash banding
(:mod:`graphdb_td2_spark.dedup.minhash`) with an edit-distance scorer
instead of signature equality.

Cross-engine determinism: the block key is string concat + first-token
split, the score is ``levenshtein`` — classic unit-cost edit distance,
an exact integer in both Spark (JVM built-in) and DuckDB — and the top-k
tiebreak is (distance asc, match key asc). No floats anywhere.

Scale notes (100 TB posture):

- the compound block key (brand × first name token) bounds block size;
  degenerate blocks (> BLOCK_CAP rows, i.e. > BLOCK_CAP² pairs) are
  dropped entirely — the same guard as the LSH ``capped_band_buckets``
  (dedup/minhash.py) — so the candidate join is at most
  n_blocks × BLOCK_CAP² pairs regardless of skew.
- the block-size table is block-cardinality-sized (small) and broadcast;
  the only corpus-sized shuffle is the equi-join on the block key.
- levenshtein runs JVM-side inside codegen — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..io import read_table

BLOCK_CAP = 1000  # degenerate-block guard: > cap rows → cap² pairs, drop
MAX_DISTANCE = 4
TOPK_MATCHES = 3


def _blocked_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = read_table(spark, sf_dir, "part", ["p_partkey", "p_name", "p_brand"])
    return parts.select(
        "p_partkey",
        "p_name",
        F.concat_ws(
            "|", F.col("p_brand"), F.split(F.col("p_name"), " ").getItem(0)
        ).alias("block"),
    )


def fuzzy_part_matches(
    spark: SparkSession,
    sf_dir: str,
    k: int = TOPK_MATCHES,
    max_distance: int = MAX_DISTANCE,
) -> DataFrame:
    """Per part: its k nearest same-block parts by name edit distance
    (≤ max_distance), tiebroken (distance asc, match_partkey asc)."""
    blocked = _blocked_parts(spark, sf_dir)
    sizes = blocked.groupBy("block").agg(F.count(F.lit(1)).alias("n"))
    kept = blocked.join(
        F.broadcast(sizes.filter(F.col("n") <= BLOCK_CAP).select("block")), "block"
    )
    left = kept.select(
        "block",
        F.col("p_partkey").alias("p_partkey"),
        F.col("p_name").alias("name_a"),
    )
    right = kept.select(
        "block",
        F.col("p_partkey").alias("match_partkey"),
        F.col("p_name").alias("name_b"),
    )
    pairs = (
        left.join(right, "block")
        .filter(F.col("p_partkey") != F.col("match_partkey"))
        .withColumn(
            "distance", F.levenshtein(F.col("name_a"), F.col("name_b")).cast("long")
        )
        .filter(F.col("distance") <= max_distance)
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.asc("distance"), F.asc("match_partkey")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("p_partkey", "rank", "match_partkey", "distance")
    )
