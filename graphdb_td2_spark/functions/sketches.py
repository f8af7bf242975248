"""Sketch aggregates [extension] — the sublinear-memory summaries a
100 TB pipeline uses where exact answers need an unbounded hash table:
HyperLogLog++ distinct counts (``approx_count_distinct``) and quantile
summaries (``approx_percentile``), both JVM-side partial aggregates that
merge associatively across partitions (one narrow shuffle of sketch
state, never of rows).

Sketches are engine-specific by nature (HLL register layouts and
quantile-summary compaction differ across implementations), so these are
deliberately NOT in the cross-engine oracle contract: correctness is
verified by error-bound units against the exact aggregates
(``tests/test_sketches.py``), which is how sketch implementations are
actually validated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..io import read_table

# approx_count_distinct's maximum relative standard deviation argument;
# the unit asserts a 5-sigma-ish envelope on the corpus.
DEFAULT_RSD = 0.05
QUANTILE_ACCURACY = 10_000  # approx_percentile accuracy knob (1/eps)


def approx_distinct_users(
    spark: SparkSession, sf_dir: str, rsd: float = DEFAULT_RSD
) -> DataFrame:
    """Per event type: exact distinct users next to the HLL++ estimate and
    its realized relative error — the audit row a sketch rollout ships
    with. At scale the exact column is the one you drop; here it is the
    measuring stick."""
    events = read_table(spark, sf_dir, "events", ["user_id", "event_type"])
    return (
        events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_exact"),
            F.approx_count_distinct("user_id", rsd=rsd).alias("n_approx"),
        )
        .select(
            "event_type",
            "n_exact",
            "n_approx",
            (
                F.abs(F.col("n_approx") - F.col("n_exact")).cast("double")
                / F.col("n_exact").cast("double")
            ).alias("rel_error"),
        )
        .orderBy("event_type")
    )


def approx_value_quantiles(
    spark: SparkSession, sf_dir: str, accuracy: int = QUANTILE_ACCURACY
) -> DataFrame:
    """Per event type: approximate p50/p95/p99 of ``value`` via the
    Greenwald-Khanna-style summary behind ``approx_percentile`` (rank
    error <= n/accuracy), next to the exact percentiles."""
    events = read_table(spark, sf_dir, "events", ["event_type", "value"])
    return (
        events.groupBy("event_type")
        .agg(
            F.expr(
                f"approx_percentile(value, array(0.5, 0.95, 0.99), {accuracy})"
            ).alias("approx"),
            F.expr("percentile(value, array(0.5, 0.95, 0.99))").alias("exact"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            F.col("approx")[0].alias("p50_approx"),
            F.col("exact")[0].alias("p50_exact"),
            F.col("approx")[1].alias("p95_approx"),
            F.col("exact")[1].alias("p95_exact"),
            F.col("approx")[2].alias("p99_approx"),
            F.col("exact")[2].alias("p99_exact"),
            "n_events",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005): the one sketch in this
# tier that IS cross-engine deterministic — the table is d×w exact integer
# counters under fixed affine hashes, so the DuckDB twin reproduces every
# estimate bit-for-bit and the driver value-hash applies (unlike HLL/GK
# above, whose register layouts are engine-specific).
#
# Scale notes: the build is one partial-agg'd groupBy over (row, bucket) —
# d×w = 4×1024 cells regardless of corpus size, the definition of a
# sublinear summary; the estimate probe joins the 4-row-per-token probe set
# against those 4096 cells (broadcast). Point-query error is bounded by
# eps·N (eps = e/w) with probability 1 - delta (delta = e^-d).
# ---------------------------------------------------------------------------

CMS_DEPTH = 4  # d hash rows
CMS_WIDTH = 1024  # w buckets per row
CMS_TOPK = 20


def _token_base_hash(token):
    """Portable 32-bit token hash: first 8 hex digits of md5 (identical
    hex in Spark and DuckDB; same scheme as dedup/minhash._base_hash)."""
    return F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("long")


def cms_heavy_hitters(
    spark: SparkSession, sf_dir: str, k: int = CMS_TOPK
) -> DataFrame:
    """Count-min estimates vs exact counts for the k most frequent
    document tokens: ``(token, exact_count, cms_count)`` with
    cms_count ≥ exact_count (one-sided error), ordered (exact desc,
    token asc)."""
    from ..dedup.minhash import HASH_P, hash_params
    from .text import tokens_col

    docs = read_table(spark, sf_dir, "documents", ["text"])
    toks = docs.select(F.explode(tokens_col(F.col("text"))).alias("token"))
    hashed = toks.select("token", _token_base_hash(F.col("token")).alias("h"))

    params = hash_params(CMS_DEPTH)
    bucket_cols = []
    for j, (a, b) in enumerate(params):
        bucket_cols.append(F.lit(j))
        bucket_cols.append(
            ((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(HASH_P)) % F.lit(CMS_WIDTH)
        )
    # one pass: stack the d bucket ids per occurrence, then count cells
    cells = (
        hashed.select(
            F.stack(F.lit(CMS_DEPTH), *bucket_cols).alias("j", "bucket")
        )
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

    exact_top = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.desc("exact_count"), F.asc("token"))
        .limit(k)
    )
    probe = exact_top.select(
        "token", "exact_count", _token_base_hash(F.col("token")).alias("h")
    ).select(
        "token",
        "exact_count",
        F.stack(F.lit(CMS_DEPTH), *bucket_cols).alias("j", "bucket"),
    )
    estimates = (
        F.broadcast(probe)
        .join(cells, ["j", "bucket"])
        .groupBy("token", "exact_count")
        .agg(F.min("cnt").cast("long").alias("cms_count"))
    )
    return estimates.select("token", "exact_count", "cms_count").orderBy(
        F.desc("exact_count"), F.asc("token")
    )


def mergeable_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch *state* as a storable, mergeable column — the
    incremental pattern a 100 TB pipeline actually uses: land one sketch
    per partition (here: per event_type), then answer "distinct users
    overall" by merging states (``hll_union_agg``) WITHOUT rescanning the
    rows. Output: per-type estimate vs exact, plus a TOTAL row whose
    estimate comes only from the merged per-type sketches.

    Engine-specific state (Datasketches HLL), so unit-checked against the
    exact aggregates like the other HLL/GK members, not oracle-hashed."""
    events = read_table(spark, sf_dir, "events", ["event_type", "user_id"])
    per_type = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.count_distinct("user_id").cast("long").alias("exact_distinct"),
    )
    typed = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sketch").cast("long").alias("est_distinct"),
        "exact_distinct",
    )
    exact_total = events.select(
        F.count_distinct("user_id").cast("long").alias("exact_distinct")
    ).collect()[0]["exact_distinct"]
    total = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).cast("long").alias(
            "est_distinct"
        )
    ).select(
        F.lit("TOTAL").alias("event_type"),
        "est_distinct",
        F.lit(exact_total).cast("long").alias("exact_distinct"),
    )
    return typed.union(total).orderBy("event_type")


def hll_daily_actives_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(day, exact_users, est_milli, err_pm)`` — a
    PORTABLE 16-register HLL distinct-user estimate per day next to the
    exact count and the realized per-mille error. Unlike
    ``approx_distinct_users`` (Spark's engine-private HLL++, oracle-
    exempt by design), this reuses the HyperBall register pipeline —
    md5 nibble → register, rho of the 32-bit suffix, pure-int64
    raw-HLL estimate — which is bit-identical in DuckDB, so the SKETCH
    ITSELF sits inside the cross-engine oracle contract: the accuracy
    audit of the sketch family, in the contract like
    ``minhash_accuracy_report`` / ``harmonic_approx_error_report``.
    Ordered by day.

    Shape: one (day, register) hash agg with map-side-combined MAX (16
    rows per day, the mergeable sketch state a 100 TB rollup would
    persist), then a per-day 16-column pivot projection for the
    estimate and one broadcast-sized join against the exact counts.
    ``est_milli`` is milli-users; err_pm = |est − 1000·exact| div exact.
    """
    from ..graph.hyperball import ALPHA_DEN, EST_NUM, M_REG, RHO_W, _rho_col

    events = read_table(spark, sf_dir, "events", ["ts", "user_id"])
    day = F.date_trunc("day", F.col("ts"))
    hx = F.md5(F.col("user_id").cast("string"))
    j = F.conv(F.substring(hx, 1, 1), 16, 10).cast("long")
    rho = _rho_col(F.conv(F.substring(hx, 2, 8), 16, 10).cast("long"))
    regs = (
        events.select(day.alias("day"), j.alias("j"), rho.alias("rho"))
        .groupBy("day", "j")
        .agg(F.max("rho").cast("long").alias("m"))
    )
    wide = regs.groupBy("day").agg(
        *[
            F.max(F.when(F.col("j") == i, F.col("m")).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"m{i}")
            for i in range(M_REG)
        ]
    )
    s_expr = " + ".join(
        f"shiftleft(cast(1 as bigint), cast({RHO_W} - m{i} as int))"
        for i in range(M_REG)
    )
    est = wide.select(
        "day",
        F.expr(
            f"cast({EST_NUM} as bigint) div (cast({ALPHA_DEN} as bigint)"
            f" * ({s_expr}))"
        )
        .cast("long")
        .alias("est_milli"),
    )
    exact = events.groupBy(day.alias("day")).agg(
        F.count_distinct(F.col("user_id")).cast("long").alias("exact_users")
    )
    return (
        exact.join(est, "day")
        .select(
            "day",
            "exact_users",
            "est_milli",
            F.expr(
                "abs(est_milli - 1000 * exact_users) div exact_users"
            )
            .cast("long")
            .alias("err_pm"),
        )
        .orderBy("day")
    )
