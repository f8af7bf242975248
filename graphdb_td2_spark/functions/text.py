"""Text-analysis functions over ``documents`` (SURVEY.md §7 Stage 5
[extension]): tokenization, quality scoring, n-gram language ID, and
polynomial document fingerprinting. All Catalyst built-ins / higher-order
functions — JVM-side, Arrow-free, codegen'd; no Python in the hot path.

Cross-engine determinism: token counts and ratios are integer math plus one
double division; fingerprints are exact 64-bit integer folds; language ID is
an argmax over integer hit counts with a fixed preference order for ties.

Scale notes: everything is a narrow per-row projection (no shuffle at all
until a downstream groupBy); at 100 TB this pipelines directly over the
parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..io import read_table

# Fixed stopword lexicons for the language-ID heuristic. Deliberately tiny
# and deterministic — the operator contract is the *shape* (argmax of n-gram
# hit counts), not linguistic accuracy.
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "fr": ("le", "la", "de", "et", "un", "une", "est", "les"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "zu"),
    "es": ("el", "la", "de", "y", "que", "un", "es", "los"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "不"),
}
LANG_ORDER: tuple[str, ...] = ("en", "fr", "de", "es", "zh")

# Polynomial rolling-hash parameters (Karp-Rabin over token hashes).
_FP_BASE = 131
_FP_MOD = (1 << 31) - 1


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization of lowercased, trimmed text."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def bind_once(expr: Column, body) -> Column:
    """Evaluate ``expr`` ONCE per row and pass the bound value to
    ``body`` (a single-element ``transform`` lambda binding).

    Embedding a non-trivial expression (e.g. a regex tokenize) inside a
    per-element higher-order-function lambda re-evaluates it once per
    element — the window builders here were re-running the split once
    per window POSITION, O(tokens²) regex work per document (the r10
    winnowing hash-once bug class; r12 thread-stack sample of the sf10
    shingle stage). A lambda variable is bound to the element VALUE, so
    routing the expression through a one-element array guarantees single
    evaluation regardless of how the optimizer inlines projections."""
    return F.transform(F.array(expr), body)[0]


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish subword count: alphanumeric runs are split into ≤4-char
    chunks, everything else is one token per char — approximated as
    ceil(len(run)/4) summed over runs, via a regex token extraction."""
    runs = F.regexp_extract_all(F.lower(text), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), 0)
    return F.aggregate(
        runs,
        F.lit(0).cast("long"),
        lambda acc, r: acc + F.ceil(F.length(r) / F.lit(4.0)).cast("long"),
    )


def _lex_hits(tokens: Column, lexicon: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*lexicon)))


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts: whitespace tokens + BPE-ish subword count
    + character stats."""
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "text"])
    tokens = tokens_col(F.col("text"))
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.size(tokens).cast("long").alias("n_tokens"),
        bpe_ish_token_count(F.col("text")).alias("n_subwords"),
        F.size(F.array_distinct(tokens)).cast("long").alias("n_distinct_tokens"),
    ).orderBy("doc_id")


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length, mean token length, stopword ratio,
    type-token ratio — the standard cheap pre-training filters."""
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "text"])
    tokens = tokens_col(F.col("text"))
    n_tokens = F.size(tokens).cast("double")
    stop_hits = _lex_hits(tokens, LANG_LEXICONS["en"]).cast("double")
    distinct_ratio = F.size(F.array_distinct(tokens)).cast("double") / n_tokens
    mean_tok_len = (
        F.aggregate(tokens, F.lit(0).cast("long"), lambda a, t: a + F.length(t)).cast(
            "double"
        )
        / n_tokens
    )
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        mean_tok_len.alias("mean_token_len"),
        (stop_hits / n_tokens).alias("stopword_ratio"),
        distinct_ratio.alias("type_token_ratio"),
    ).orderBy("doc_id")


# Quality-filter thresholds (C4/Gopher-style, scaled to the synthetic
# corpus). Every rule is an INTEGER comparison — mean-token-length and
# type-token-ratio bounds are cross-multiplied (2·n_tok ≤ total_len ≤
# 12·n_tok; 10·n_distinct ≥ 3·n_tok) so the oracle can't diverge on
# float rounding even in principle.
QF_MIN_TOKENS = 10
QF_MAX_TOKENS = 5000
QF_MIN_MEAN_LEN_NUM = 2  # mean token length >= 2
QF_MAX_MEAN_LEN_NUM = 12  # mean token length <= 12
QF_TTR_NUM, QF_TTR_DEN = 3, 10  # type-token ratio >= 0.3
QF_MIN_STOP_HITS = 1  # at least one stopword from any lexicon


def quality_filter_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality-filter PIPELINE step (not just the scores): apply the
    cheap pre-training document filters and report, per source, how many
    documents each rule drops — first-failing-rule attribution, so the
    counts partition ``n_docs`` exactly.

    Rules (all exact integer comparisons, see QF_* constants):
    length (token-count window) → shape (mean token length + type-token
    ratio, cross-multiplied) → stopword (≥1 hit across all lexicons).
    Scale: one narrow projection + one hash aggregate on ``source``.
    """
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "source", "text"])
    tokens = tokens_col(F.col("text"))
    all_words = tuple(w for lex in LANG_LEXICONS.values() for w in lex)
    n_tok = F.size(tokens).cast("long")
    total_len = F.aggregate(
        tokens, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
    )
    n_distinct = F.size(F.array_distinct(tokens)).cast("long")
    stop_hits = _lex_hits(tokens, all_words).cast("long")

    r_length = (n_tok >= QF_MIN_TOKENS) & (n_tok <= QF_MAX_TOKENS)
    r_shape = (
        (total_len >= QF_MIN_MEAN_LEN_NUM * n_tok)
        & (total_len <= QF_MAX_MEAN_LEN_NUM * n_tok)
        & (QF_TTR_DEN * n_distinct >= QF_TTR_NUM * n_tok)
    )
    r_stop = stop_hits >= QF_MIN_STOP_HITS

    flagged = docs.select(
        "source",
        (~r_length).cast("long").alias("d_length"),
        (r_length & ~r_shape).cast("long").alias("d_shape"),
        (r_length & r_shape & ~r_stop).cast("long").alias("d_stopword"),
        (r_length & r_shape & r_stop).cast("long").alias("kept"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("kept").alias("n_kept"),
            F.sum("d_length").alias("n_dropped_length"),
            F.sum("d_shape").alias("n_dropped_shape"),
            F.sum("d_stopword").alias("n_dropped_stopword"),
        )
        .withColumn(
            "kept_share",
            F.col("n_kept").cast("double") / F.col("n_docs").cast("double"),
        )
        .orderBy("source")
    )


TOP_NGRAMS_K = 5


def top_bigrams_per_source(
    spark: SparkSession, sf_dir: str, k: int = TOP_NGRAMS_K
) -> DataFrame:
    """Per-source top-k token bigrams — the n-gram frequency profile a
    corpus audit ships with (contamination screening, boilerplate
    detection). Deterministic top-k: count desc, then bigram asc.

    Scale: explode to (source, bigram) → one partial-agg'd count shuffle →
    per-source row_number top-k (source cardinality is dimension-sized, so
    the window shuffle is small); the exploded relation is the same order
    of magnitude as the token stream, never tokens²."""
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents", ["source", "text"])
    bigrams = bind_once(
        tokens_col(F.col("text")),
        lambda toks: F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    counts = (
        docs.select("source", F.explode(bigrams).alias("bigram"))
        .groupBy("source", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("n"), F.asc("bigram"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("source", "rank", "bigram", "n")
        .orderBy("source", "rank")
    )


DISTINCTIVE_K = 5


def distinctive_terms(
    spark: SparkSession, sf_dir: str, k: int = DISTINCTIVE_K
) -> DataFrame:
    """TF-IDF-shaped distinctive terms per source: term frequency within
    the source weighted by corpus-wide rarity. The idf is the exact ratio
    ``n_docs_total / df`` instead of its log — same ranking for a fixed
    corpus, but computed as ONE double multiply+divide from exact integer
    counts, so the cross-engine hash cannot drift on transcendental
    library differences (log/ln may differ in the last ulp across libms).

    Scale: token explode → two partial-agg'd shuffles (per-source tf,
    corpus df) joined on the token — df is token-dimension-sized; the
    final per-source top-k is a window over source (dimension-sized)."""
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents", ["doc_id", "source", "text"])
    n_docs = docs.count()
    tok = docs.select(
        "doc_id", "source", F.explode(F.array_distinct(tokens_col(F.col("text")))).alias("token")
    )
    tf = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(df_, "token").select(
        "source",
        "token",
        "tf",
        "df",
        (
            F.col("tf").cast("double")
            * F.lit(float(n_docs))
            / F.col("df").cast("double")
        ).alias("score"),
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("score"), F.asc("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("source", "rank", "token", "tf", "df", "score")
        .orderBy("source", "rank")
    )


def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hit counts
    with a fixed preference order for ties; emitted as a (lang ×
    predicted_lang) confusion matrix against the corpus label."""
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "text", "lang"])
    tokens = tokens_col(F.col("text"))
    scored = docs.select(
        "doc_id",
        "lang",
        *[_lex_hits(tokens, LANG_LEXICONS[lang]).alias(f"hits_{lang}") for lang in LANG_ORDER],
    )
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in LANG_ORDER])
    predicted = F.lit("unknown")
    # Build the CASE in reverse preference order so earlier languages win ties.
    for lang in reversed(LANG_ORDER):
        predicted = F.when(
            (best > 0) & (F.col(f"hits_{lang}") == best), F.lit(lang)
        ).otherwise(predicted)
    return (
        scored.withColumn("predicted_lang", predicted)
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "predicted_lang")
    )


def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document — the filter family
    that catches templated/looping text exact-dedup misses: most-frequent
    token count, most-frequent bigram count, and the fraction of token
    occurrences belonging to a token that repeats (≥2 occurrences).

    Shape: explode → per-(doc, gram) count → per-doc aggregate — two
    partial-agg'd shuffles over the token stream (NOT per-row nested
    array scans: an O(n·distinct) higher-order-function formulation is
    measured orders of magnitude slower under interpreted lambda eval
    and would re-do quadratic work per row at 100 TB; the exploded
    aggregate is the same map-side-combined shape as every word-count).
    All counts are exact integers; the single double division is the
    repeated-token fraction."""
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "text"])
    toks = tokens_col(F.col("text"))
    bigrams = bind_once(
        toks,
        lambda t: F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.concat_ws(" ", F.slice(t, i, 2)),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )

    tok_stats = (
        docs.select("doc_id", F.explode(toks).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.max("c").alias("top_token_n"),
            F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0)).alias("dup_occ"),
        )
    )
    big_stats = (
        docs.select("doc_id", F.explode(bigrams).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bigram_n"))
    )
    return (
        tok_stats.join(big_stats, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("top_token_n").cast("long").alias("top_token_n"),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce(F.col("top_bigram_n"), F.lit(0))
            .cast("long")
            .alias("top_bigram_n"),
            (F.col("dup_occ").cast("double") / F.col("n_tokens").cast("double")).alias(
                "dup_token_frac"
            ),
        )
        .orderBy("doc_id")
    )


CONTAM_EVAL_DOCS = 10  # doc_id < 10 plays the held-out benchmark set
CONTAM_MIN_SHARED = 5  # shared distinct shingles to call a doc contaminated


def contamination_overlap(
    spark: SparkSession,
    sf_dir: str,
    n_eval: int = CONTAM_EVAL_DOCS,
    min_shared: int = CONTAM_MIN_SHARED,
) -> DataFrame:
    """Benchmark-contamination screen: for each held-out "eval" document
    (``doc_id < n_eval``), how much of the training corpus shares its
    k-token shingles — candidate count (any overlap), contaminated count
    (≥ ``min_shared`` shared shingles), and the worst offender's overlap.

    Reuses the session shingle table (one tokenize pass corpus-wide); the
    eval side is dimension-sized, so the shingle equi-join broadcasts it
    and the corpus side streams. At full scale the shingle join IS the
    standard exact decontamination pass (the Gopher/LLaMA recipe); a
    banded/LSH variant trades exactness for cheaper candidate generation
    when the eval suite itself is huge."""
    from ..dedup.shingles import cached_doc_shingles

    sh = cached_doc_shingles(spark, sf_dir).select("doc_id", "shingle")
    ev = sh.filter(F.col("doc_id") < n_eval).select(
        F.col("doc_id").alias("eval_doc_id"), "shingle"
    )
    corpus = sh.filter(F.col("doc_id") >= n_eval)
    pairs = (
        corpus.join(F.broadcast(ev), "shingle")
        .groupBy("eval_doc_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        pairs.groupBy("eval_doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum((F.col("n_shared") >= min_shared).cast("long")).alias(
                "n_contaminated"
            ),
            F.max("n_shared").alias("max_shared"),
        )
        .orderBy("eval_doc_id")
    )


def fingerprint_col(text: Column) -> Column:
    """Polynomial rolling hash over the token stream: each token is mapped
    to a 28-bit integer via an md5 prefix, then folded with
    ``acc = (acc * 131 + tok) mod (2^31 - 1)`` — exact 64-bit integer math,
    identical in any engine."""
    tok_ints = F.transform(
        tokens_col(text),
        lambda t: F.conv(F.substring(F.md5(t), 1, 7), 16, 10).cast("long"),
    )
    return F.aggregate(
        tok_ints,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * _FP_BASE + t) % _FP_MOD,
    )


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document rolling-hash fingerprint + duplicate-group size."""
    docs = read_table(spark, sf_dir, "documents", ["doc_id", "text"])
    fps = docs.select("doc_id", fingerprint_col(F.col("text")).alias("fingerprint"))
    from pyspark.sql import Window

    w = Window.partitionBy("fingerprint")
    return (
        fps.withColumn("group_size", F.count(F.lit(1)).over(w).cast("long"))
        .select("doc_id", "fingerprint", "group_size")
        .orderBy("doc_id")
    )


def readability_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(source, n_docs, n_words, n_sentences,
    n_syllables, flesch)`` — per-source Flesch reading-ease computed on
    AGGREGATE counts (206.835 − 1.015·words/sentence − 84.6·syllables/
    word), the cheap fluency signal a pretraining filter stacks next to
    the rule- and classifier-based scores. Ordered by source.

    Syllables ≈ vowel GROUPS per word (the standard heuristic);
    sentences = terminal-punctuation runs, floored at 1 per doc. All
    three corpus sums are exact integers, and flesch is a fixed
    three-op IEEE expression over them — per-doc float averaging (whose
    summation order no engine guarantees) never happens.

    Scale notes: regexp_count runs inside codegen per row; one
    partial-agged hash agg per source; output |source|-bounded.
    """
    docs = read_table(spark, sf_dir, "documents", ["source", "text"])
    lower = F.lower(F.col("text"))
    words = F.size(F.regexp_extract_all(lower, F.lit(r"[a-z0-9]+"), 0)).cast("long")
    syllables = F.size(
        F.regexp_extract_all(lower, F.lit(r"[aeiouy]+"), 0)
    ).cast("long")
    sentences = F.greatest(
        F.size(F.regexp_extract_all(lower, F.lit(r"[.!?]+"), 0)).cast("long"),
        F.lit(1).cast("long"),
    )
    sums = docs.select(
        "source", words.alias("w"), syllables.alias("y"), sentences.alias("s")
    ).groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("w").cast("long").alias("n_words"),
        F.sum("s").cast("long").alias("n_sentences"),
        F.sum("y").cast("long").alias("n_syllables"),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("n_words").cast("double") / F.col("n_sentences").cast("double"))
        - F.lit(84.6) * (F.col("n_syllables").cast("double") / F.col("n_words").cast("double"))
    )
    return sums.select(
        "source", "n_docs", "n_words", "n_sentences", "n_syllables",
        flesch.alias("flesch"),
    ).orderBy("source")


def script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(source, n_chars, n_letter, n_digit, n_space,
    n_punct, n_other)`` — character-class composition per source (the
    multilingual-corpus screen that catches mojibake, binary spill, and
    markup floods before tokenization). Ordered by source.

    Determinism: five exact ``regexp_extract_all`` counts over POSIX
    classes both engines implement identically; ``n_other`` is the
    arithmetic remainder, so the six counts partition ``n_chars``
    exactly (the test pins the identity). Scale: codegen'd per-row
    regex into one partial-agged rollup.
    """
    docs = read_table(spark, sf_dir, "documents", ["source", "text"])
    cls = lambda pat: F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), 0)).cast("long")  # noqa: E731
    per_doc = docs.select(
        "source",
        F.length("text").cast("long").alias("c"),
        cls(r"[A-Za-z]").alias("l"),
        cls(r"[0-9]").alias("d"),
        cls(r"[ \t\n\r]").alias("s"),
        cls(r"[.,;:!?'\"()\[\]-]").alias("p"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_chars"),
            F.sum("l").cast("long").alias("n_letter"),
            F.sum("d").cast("long").alias("n_digit"),
            F.sum("s").cast("long").alias("n_space"),
            F.sum("p").cast("long").alias("n_punct"),
            (F.sum("c") - F.sum("l") - F.sum("d") - F.sum("s") - F.sum("p"))
            .cast("long")
            .alias("n_other"),
        )
        .orderBy("source")
    )


BLOCKLIST = ("damn", "hell", "stupid", "hate", "kill")


def blocklist_hit_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(source, n_docs, n_flagged, total_hits,
    flag_rate)`` — word-blocklist screening per source (the cheap
    harmful-content pre-filter that runs before any model-based safety
    scorer; the list here is a tame stand-in exercising the plumbing).
    Ordered by source.

    Determinism: hits are exact whitespace-token membership counts
    against the broadcast-inlined list (same ``_lex_hits`` idiom as the
    stopword features); one division for the rate. Scale: the usual
    token-explode-free higher-order-function scan + per-source rollup.
    """
    docs = read_table(spark, sf_dir, "documents", ["source", "text"])
    tokens = tokens_col(F.col("text"))
    hits = _lex_hits(tokens, BLOCKLIST).cast("long")
    per_doc = docs.select("source", hits.alias("hits"))
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum((F.col("hits") > 0).cast("long")).cast("long").alias("n_flagged"),
            F.sum("hits").cast("long").alias("total_hits"),
        )
        .select(
            "source",
            "n_docs",
            "n_flagged",
            "total_hits",
            (F.col("n_flagged").cast("double") / F.col("n_docs").cast("double")).alias(
                "flag_rate"
            ),
        )
        .orderBy("source")
    )


def lang_script_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(lang, dominant_class, n_docs)`` — cross-tab of
    the DECLARED language column against each document's dominant
    character class (letter / digit / other) — the consistency screen
    that catches mislabeled or non-text rows per language. Ordered by
    (lang, dominant_class).

    Determinism: per-doc class counts are exact; the argmax is a fixed
    CASE priority (letter > digit > other on ties). One scan, one
    |lang|·3-bounded rollup."""
    docs = read_table(spark, sf_dir, "documents", ["lang", "text"])
    n_letter = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z]"), 0)).cast("long")
    n_digit = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[0-9]"), 0)).cast("long")
    n_other = F.length("text").cast("long") - n_letter - n_digit
    dominant = (
        F.when((n_letter >= n_digit) & (n_letter >= n_other), F.lit("letter"))
        .when(n_digit >= n_other, F.lit("digit"))
        .otherwise(F.lit("other"))
    )
    return (
        docs.select("lang", dominant.alias("dominant_class"))
        .groupBy("lang", "dominant_class")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("lang", "dominant_class")
    )


def source_diversity_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(source, n_tokens, n_types, collision_num,
    simpson_diversity)`` — Gini-Simpson lexical diversity per source
    [extension]: the probability two tokens drawn without replacement
    differ, ``1 − Σ n_t(n_t−1) / (N(N−1))``.

    The diversity screen that catches template-heavy or machine-generated
    sources BEFORE dedup: boilerplate collapses the token distribution,
    so its collision mass Σn_t(n_t−1) spikes while a Shannon-entropy
    screen would need a transcendental log. Gini-Simpson needs only
    exact integer sufficient statistics and ONE final IEEE division
    (the repo determinism rule — same shape as event_transition_matrix),
    so the oracle hash-matches.

    Scale notes: one (source, token) partial-aggregated count, one
    source-grain rollup — output bounded by |sources|. int64 headroom:
    collision_num ≤ N², safe to N ≈ 3·10⁹ tokens per source; past that
    the same statistic lands in DECIMAL(38,0) unchanged.
    """
    docs = read_table(spark, sf_dir, "documents", ["source", "text"])
    toks = docs.select(
        "source", F.explode(tokens_col(F.col("text"))).alias("token")
    )
    per_token = toks.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("n_t")
    )
    per_source = per_token.groupBy("source").agg(
        F.sum("n_t").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.expr("n_t * (n_t - 1)")).cast("long").alias("collision_num"),
    )
    return per_source.select(
        "source",
        "n_tokens",
        "n_types",
        "collision_num",
        # degenerate-source guard mirrored in the oracle: N ≤ 1 has no
        # token pair, and engines disagree on double x/0 (ADVICE r7)
        F.when(
            F.col("n_tokens") > 1,
            F.lit(1.0)
            - F.col("collision_num").cast("double")
            / (F.col("n_tokens") * (F.col("n_tokens") - 1)).cast("double"),
        ).alias("simpson_diversity"),
    ).orderBy("source")


def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``(lang, n_docs, n_words, n_subwords, fertility)``
    — subwords-per-word by language [extension]: the multilingual
    tokenizer-quality metric (a language whose fertility runs hot pays
    more context budget per word — the standard argument for rebalancing
    a tokenizer's training mix, and the per-language companion of
    ``bpe_encoded_stats``'s corpus-wide histogram).

    Exactness: whitespace words and the BPE-ish subword count are both
    exact integer sums (``bpe_ish_token_count`` is ceil-division
    arithmetic); fertility is ONE IEEE division. Scale: one
    partial-aggregated |lang|-group hash agg over the documents scan.
    """
    docs = read_table(spark, sf_dir, "documents", ["lang", "text"])
    per = docs.select(
        "lang",
        F.size(tokens_col(F.col("text"))).cast("long").alias("w"),
        bpe_ish_token_count(F.col("text")).alias("sw"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("w").cast("long").alias("n_words"),
            F.sum("sw").cast("long").alias("n_subwords"),
        )
        .select(
            "lang",
            "n_docs",
            "n_words",
            "n_subwords",
            (
                F.col("n_subwords").cast("double") / F.col("n_words").cast("double")
            ).alias("fertility"),
        )
        .orderBy("lang")
    )


COLLOC_MIN_COUNT = 5
COLLOC_K = 30


def collocation_pmi_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = COLLOC_K,
    min_count: int = COLLOC_MIN_COUNT,
) -> DataFrame:
    """Registry entry: ``(rank, w1, w2, n_ab, n_a, n_b, pmi_ratio)`` —
    the ``k`` adjacent-token collocations with the highest pointwise
    mutual information over the whole corpus, support ≥ ``min_count``.
    ``pmi_ratio`` is the PMI argument P(ab)/(P(a)·P(b)) itself rather
    than its log (same ranking, and it stays ONE fixed-shape IEEE
    expression over five exact integers — no engine-dependent log).
    Ties → (w1, w2) ascending. The collocation-extraction companion of
    ``top_bigrams_per_source`` (raw frequency) and ``top_lift_pairs``
    (basket lift): raw-frequency top lists surface boilerplate, PMI
    surfaces multiword units.

    Shape: one token explode → unigram hash agg; one adjacent-pair
    explode → bigram hash agg (stream-sized, never tokens²); support
    filter BEFORE the two unigram joins prunes the long tail; the two
    corpus totals ride in via a broadcast 1-row cross join; final exact
    top-k via ordered limit over the support-filtered survivors.
    """
    docs = read_table(spark, sf_dir, "documents", ["text"])
    toks = tokens_col(F.col("text"))
    uni = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("n_w"))
    )
    pairs_arr = bind_once(
        toks,
        lambda t: F.when(
            F.size(t) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - 1),
                lambda i: F.struct(
                    F.element_at(t, i).alias("w1"),
                    F.element_at(t, i + 1).alias("w2"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>")),
    )
    bi_all = (
        docs.select(F.explode(pairs_arr).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    bi = bi_all.filter(F.col("n_ab") >= min_count)
    # totals are over the FULL streams (the probability denominators),
    # not the support-filtered survivors
    totals = uni.agg(
        F.sum("n_w").cast("long").alias("n_uni")
    ).crossJoin(
        bi_all.agg(F.sum("n_ab").cast("long").alias("n_bi"))
    )
    scored = (
        bi.join(
            uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_a")), "w1"
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_b")), "w2"
        )
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "pmi_ratio",
            F.expr(
                "(CAST(n_ab AS DOUBLE) * CAST(n_uni AS DOUBLE)"
                " * CAST(n_uni AS DOUBLE))"
                " / ((CAST(n_bi AS DOUBLE) * CAST(n_a AS DOUBLE))"
                " * CAST(n_b AS DOUBLE))"
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("pmi_ratio"), F.asc("w1"), F.asc("w2"))
    return (
        scored.orderBy(F.desc("pmi_ratio"), F.asc("w1"), F.asc("w2"))
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "w1", "w2", "n_ab", "n_a", "n_b", "pmi_ratio")
        .orderBy("rank")
    )
