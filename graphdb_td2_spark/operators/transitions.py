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


def markov_next_event_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(prev_type, predicted_next, n_train_trans,
    n_test_trans, n_correct, accuracy)`` — walk-forward evaluation of
    the first-order Markov next-event predictor: train the transition
    matrix on the past, predict each held-out transition's next type as
    the argmax train count for its prev type (ties → lexicographically
    smallest next_type), and score top-1 accuracy per prev type.
    Ordered by prev_type.

    Time split (same 4/5 rule as ``recs/backtest.py``): cutoff_date =
    min event date + (span_days·4 div 5); a transition belongs to TEST
    when its NEXT event falls strictly after the cutoff date, TRAIN
    otherwise — every consecutive pair is used exactly once, and pairs
    that straddle the boundary score the model on exactly the
    information it would have had. Prev types never seen in training
    are dropped (inner join); with the 3-type enum this is vacuous.

    No reference counterpart [extension]; the forecasting-eval twin of
    ``event_transition_matrix`` the way ``recs_backtest_hitrate`` is of
    the recs chain.

    Shape: one scan → per-user lag window (the sessionize shuffle) →
    two |types|²-bounded hash aggs + one |types|-row broadcast join of
    the argmax model into the test rollup. The cutoff is a 1-row bounds
    aggregate cross-joined in (broadcast, no driver round-trip).
    Accuracy is the single IEEE division of two exact longs.
    """
    ev = read_table(
        spark, sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]
    )
    seq = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(seq))
        .filter(F.col("prev_type").isNotNull())
        .select(
            "prev_type",
            F.col("event_type").alias("next_type"),
            F.to_date("ts").alias("next_date"),
        )
    )
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("dmin"), F.max(F.to_date("ts")).alias("dmax")
    ).select(
        F.date_add(
            F.col("dmin"),
            F.floor(F.datediff(F.col("dmax"), F.col("dmin")) * 4 / 5)
            .cast("int"),
        ).alias("cutoff")
    )
    split = pairs.crossJoin(F.broadcast(bounds))
    train = split.filter(F.col("next_date") <= F.col("cutoff"))
    test = split.filter(F.col("next_date") > F.col("cutoff"))

    counts = train.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    pick = Window.partitionBy("prev_type").orderBy(
        F.desc("n"), F.asc("next_type")
    )
    model = (
        counts.withColumn("rk", F.row_number().over(pick))
        .withColumn(
            "n_train_trans",
            F.sum("n").over(Window.partitionBy("prev_type")).cast("long"),
        )
        .filter(F.col("rk") == 1)
        .select(
            "prev_type",
            F.col("next_type").alias("predicted_next"),
            "n_train_trans",
        )
    )
    scored = test.join(F.broadcast(model), "prev_type").groupBy(
        "prev_type", "predicted_next", "n_train_trans"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_test_trans"),
        F.sum(
            (F.col("next_type") == F.col("predicted_next")).cast("long")
        )
        .cast("long")
        .alias("n_correct"),
    )
    return scored.select(
        "prev_type",
        "predicted_next",
        "n_train_trans",
        "n_test_trans",
        "n_correct",
        (F.col("n_correct").cast("double") / F.col("n_test_trans")).alias(
            "accuracy"
        ),
    ).orderBy("prev_type")
