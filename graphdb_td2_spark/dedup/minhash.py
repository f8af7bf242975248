"""MinHash + LSH near-duplicate detection (shingle → minhash → band →
bucket-join) — the standard web-scale near-dedup pipeline (Broder '97 /
the Spark MinHashLSH design, re-expressed with Catalyst built-ins).

Hash family: ``h_j(s) = int(md5(s ∥ ':' ∥ j)[:15 hex])`` — md5 is available
and bit-identical in every engine (the DuckDB oracle reproduces it exactly),
15 hex digits fit a signed 64-bit integer.

Pipeline:
1. shingles: k-token windows of the normalized token stream (array
   higher-order functions — no explode until banding);
2. signature: ``sig[j] = min_s h_j(s)`` per document;
3. banding: the signature is cut into ``n_bands`` bands of ``rows_per_band``
   values; each band hashes to a bucket key;
4. candidate pairs: documents sharing any band bucket (self-join on the
   bucket key), deduped.

Scale notes: the only shuffle is the band-bucket self-join; bucket keys are
md5-uniform so the join is skew-free unless true duplicate clusters exist —
exactly the rows we want colliding. Frequency-capping enormous buckets
(degenerate near-identical corpora) would bound the worst case; at corpus
scale buckets are tiny. Signature computation is a narrow projection over
the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..io import read_table
from ..functions.text import tokens_col

N_HASHES = 16
N_BANDS = 4  # 4 rows per band → s-curve threshold ≈ (1/4)^(1/4) ≈ 0.71
SHINGLE_K = 3


def _shingles(text: Column, k: int = SHINGLE_K) -> Column:
    """k-token shingles as strings; documents shorter than k tokens get a
    single whole-document shingle."""
    toks = tokens_col(text)
    n = F.size(toks)
    windows = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    return F.array_distinct(windows)


def _md5_int(s: Column) -> Column:
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def _min_hash(shingles: Column, j: int) -> Column:
    return F.array_min(
        F.transform(shingles, lambda s: _md5_int(F.concat(s, F.lit(f":{j}"))))
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = N_HASHES,
) -> DataFrame:
    """(id, sig_0 … sig_{n-1}) minhash signature per document."""
    sh = _shingles(F.col(text_col))
    return docs.select(
        F.col(id_col),
        *[_min_hash(sh, j).alias(f"sig_{j}") for j in range(n_hashes)],
    )


def band_buckets(
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """(id, band, bucket) — one row per band; bucket = md5 of the band's
    signature slice."""
    rows_per_band = n_hashes // n_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            F.col(f"sig_{b * rows_per_band + r}").cast("string")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    return (
        signatures.select(F.col(id_col), F.explode(bands).alias("bb"))
        .select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    )


def minhash_lsh_pairs(
    spark: SparkSession,
    sf_dir: str,
    n_hashes: int = N_HASHES,
    n_bands: int = N_BANDS,
) -> DataFrame:
    """Candidate near-duplicate pairs over ``documents``: ids sharing at
    least one LSH band bucket, with the number of colliding bands."""
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "text"])
    buckets = band_buckets(minhash_signatures(docs, n_hashes=n_hashes), n_hashes=n_hashes, n_bands=n_bands)
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
        .orderBy("doc_id_a", "doc_id_b")
    )
