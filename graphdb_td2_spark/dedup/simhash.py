"""SimHash document fingerprinting (Charikar '02 / the Google near-dup
paper): each token votes its hash bits up or down; the sign vector is the
fingerprint. Near-duplicates differ in few bits (small Hamming distance).

Implementation is one hash aggregate with 32 integer vote expressions — no
bit-position explode, no UDF: token → 32-bit md5-prefix integer; per
document, ``ones_b = Σ ((h >> b) & 1)``; fingerprint bit b is set when
``2 * ones_b > n_tokens``. All exact integer math, engine-portable.

Scale notes: narrow projection + single map-side-combinable aggregate keyed
by doc_id (no cross-doc shuffle at all when computed in the document scan's
partitioning); pairing by fingerprint is a hash-groupBy on a 32-bit key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import read_table
from ..functions.text import tokens_col

N_BITS = 32


def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash, group_size): 32-bit simhash per document plus the
    number of documents sharing the exact fingerprint."""
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "text"])
    tok_hash = F.transform(
        tokens_col(F.col("text")),
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )
    exploded = docs.select("doc_id", F.explode(tok_hash).alias("h"))
    votes = exploded.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        *[
            F.sum(F.shiftright("h", b).bitwiseAND(F.lit(1))).alias(f"ones_{b}")
            for b in range(N_BITS)
        ],
    )
    simhash = None
    for b in range(N_BITS):
        bit = F.when(F.col(f"ones_{b}") * 2 > F.col("n_tokens"), F.lit(1 << b)).otherwise(
            F.lit(0)
        ).cast("long")
        simhash = bit if simhash is None else simhash + bit
    fps = votes.select("doc_id", simhash.alias("simhash"))
    from pyspark.sql import Window

    w = Window.partitionBy("simhash")
    return (
        fps.withColumn("group_size", F.count(F.lit(1)).over(w).cast("long"))
        .select("doc_id", "simhash", "group_size")
    )


def hamming_distance(a, b):
    """Hamming distance between two simhash columns (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))
