"""First-order Markov transition matrix over the event stream — the
"what happens after X" profile (next-event prediction prior, funnel
diagnostics, session-model fitting) computed corpus-wide in one pass.

Reference parity: the reference's event tables model the same
user-ordered action sequences its recommendation tier consumes
(``app/etl.py`` NEXT-style edges); this is the aggregate view of those
sequences.

Plan shape: one scan → per-user ``lag`` window (shuffle on user_id —
the same partitioning ``sessionize``/``user_event_deltas`` use) →
(prev, next) hash aggregate with map-side partials. The row-count
ceiling is |event_type|², corpus-size-independent, so the output and
the per-``prev`` normalizing window are both tiny. Probability is a
single IEEE division of two exact longs (cross-engine deterministic).

Determinism: the per-user order is ``(ts, event_id)`` — event_id breaks
equal-timestamp ties, so ``lag`` sees one canonical sequence under any
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..io import read_table


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(prev_type, next_type, n_trans, n_from, p)`` —
    observed next-event transition counts and conditional probability,
    ordered by (prev_type, next_type)."""
    ev = read_table(spark, sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    seq = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(seq))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_trans"))
    )
    norm = Window.partitionBy("prev_type")
    return (
        pairs.withColumn("n_from", F.sum("n_trans").over(norm).cast("long"))
        .withColumn(
            "p", F.col("n_trans").cast("double") / F.col("n_from").cast("double")
        )
        .select("prev_type", "next_type", "n_trans", "n_from", "p")
        .orderBy("prev_type", "next_type")
    )


def event_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(type_a, type_b, n_both, n_a, n_b, lift)`` —
    SET-level affinity between event types: for each unordered pair,
    the lift ``(n_both · n_users) / (n_a · n_b)`` over user sets (did
    doing A make doing B more likely over a user's lifetime?) — the
    unordered companion of the sequential transition matrix above.
    Ordered by (type_a, type_b).

    Determinism: distinct (user, type) sets are exact; lift is ONE
    double expression over four exact integers with the same
    parenthesization as the basket-level ``top_lift_pairs``. Scale: the
    self-join is keyed on user_id with |types|-bounded per-user sides;
    output |types|²-bounded.
    """
    ev = read_table(spark, sf_dir, "events", ["user_id", "event_type"])
    ut = ev.distinct()
    n_users = ut.select("user_id").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    per_type = ut.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a, b = ut.alias("a"), ut.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    na = per_type.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    nb = per_type.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            (
                (F.col("n_both").cast("double") * F.col("n_users").cast("double"))
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("lift"),
        )
        .orderBy("type_a", "type_b")
    )


PATH_MAX_EVENTS = 5
PATH_TOPK = 20


def top_session_paths(
    spark: SparkSession,
    sf_dir: str,
    k: int = PATH_TOPK,
    max_events: int = PATH_MAX_EVENTS,
) -> DataFrame:
    """Registry entry: ``(path, n_sessions, n_converting)`` — the ``k``
    most common session JOURNEYS: each session's first ``max_events``
    event types under the canonical (ts, event_id) order joined with
    '>' (e.g. ``view>click>purchase``), counted across sessions, with
    how many of those sessions contain a purchase anywhere. The full-
    sequence companion of the pairwise Markov matrix
    (``event_transition_matrix``). Ties break on path; ordered by
    (n_sessions DESC, path ASC).

    Determinism: session assignment is sessionize's integer gap rule;
    the per-session prefix is taken from a SORTED struct array (ts,
    event_id, type) — no collect_list order dependence; counts are
    exact longs.

    Scale notes: one user-keyed window pass (shared shape with the
    window family), one (user, session) aggregate whose state is the
    ≤max_events prefix (sort_array over the session's events — bounded
    by session length), one path rollup, TakeOrderedAndProject.
    """
    from .windows import SESSION_GAP_MINUTES

    events = read_table(
        spark, sf_dir, "events", ["user_id", "ts", "event_id", "event_type"]
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts"))
    gap = micros - F.lag(micros).over(w)
    sess = events.withColumn(
        "new_session",
        F.when(
            gap.isNull() | (gap > SESSION_GAP_MINUTES * 60 * 1_000_000),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("session_id", F.sum("new_session").over(w))
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.slice(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                F.unix_micros("ts").alias("us"),
                                F.col("event_id").alias("eid"),
                                F.col("event_type").alias("t"),
                            )
                        )
                    ),
                    lambda s: s["t"],
                ),
                1,
                max_events,
            ),
            ">",
        ).alias("path"),
        F.max(
            (F.col("event_type") == "purchase").cast("long")
        ).alias("converted"),
    )
    return (
        per_session.groupBy("path")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("converted").cast("long").alias("n_converting"),
        )
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(k)
    )


SEQ_TOP_K = 20


def frequent_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(seq, seq_len, n_users)`` — the top
    ``SEQ_TOP_K`` frequent event-type SEQUENCES (length 2 and 3) by
    exists-subsequence user support [extension]: sequential pattern
    mining (the PrefixSpan/GSP statistic), distinct from the Markov
    matrix (adjacent pairs only) and the fixed-pattern funnel — here b
    need not immediately follow a, and every candidate sequence over the
    type alphabet is scored.

    Support semantics (exact, order-theoretic): a user supports (a, b)
    iff some a-event is STRICTLY earlier than some b-event —
    equivalently ``min_ts(a) < max_ts(b)``; (a, b, c) iff some b-event
    lies strictly between ``min_ts(a)`` and ``max_ts(c)``. Equal
    timestamps never count as ordered (documented tightening — no
    tie-break dependence), so both engines agree on raw timestamp
    comparisons.

    Scale notes: the pair stage is a per-(user, type) min/max aggregate
    joined with itself on user (fan-out ≤ |types|² per user); the triple
    stage joins the bounded (user, a, c) interval table back to the
    user's events (fan-out ≤ |types|²·events(u)) — both corpus-linear
    with an alphabet-squared constant, never user-pair quadratic. Output
    compiles to TakeOrderedAndProject.
    """
    events = read_table(spark, sf_dir, "events", ["user_id", "ts", "event_type"])
    per = events.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    a = per.select(
        "user_id", F.col("event_type").alias("ta"), F.col("first_ts").alias("lo")
    )
    c = per.select(
        "user_id", F.col("event_type").alias("tc"), F.col("last_ts").alias("hi")
    )
    ordered = a.join(c, "user_id").filter(F.col("lo") < F.col("hi"))
    pair_support = (
        ordered.groupBy("ta", "tc")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(
            F.concat_ws(">", "ta", "tc").alias("seq"),
            F.lit(2).cast("long").alias("seq_len"),
            "n_users",
        )
    )
    mids = (
        ordered.join(
            events.select("user_id", F.col("event_type").alias("tb"), "ts"),
            "user_id",
        )
        .filter((F.col("ts") > F.col("lo")) & (F.col("ts") < F.col("hi")))
        .select("user_id", "ta", "tb", "tc")
        .distinct()
    )
    triple_support = (
        mids.groupBy("ta", "tb", "tc")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .select(
            F.concat_ws(">", "ta", "tb", "tc").alias("seq"),
            F.lit(3).cast("long").alias("seq_len"),
            "n_users",
        )
    )
    return (
        pair_support.unionByName(triple_support)
        .orderBy(F.desc("n_users"), F.asc("seq_len"), F.asc("seq"))
        .limit(SEQ_TOP_K)
    )
