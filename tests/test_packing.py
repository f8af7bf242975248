"""Hand-computed fixture for the concatenate-and-chop packing plan
(functions/packing.py): per-source cumulative spans, boundary crossings,
and document-aligned padding waste."""

from __future__ import annotations

import pytest

from graphdb_td2_spark.functions.packing import context_packing_stats


@pytest.fixture
def docs_dir(spark, tmp_path):
    # one-token word stream: n_tokens == word count exactly
    rows = [
        # source s1, C=4: docs of 3, 3, 2 tokens → cum 3, 6, 8
        #   doc 1 spans tokens [0,3) → ctx 0..0 (no cross)
        #   doc 2 spans [3,6) → ctx 0..1 (CROSS)
        #   doc 3 spans [6,8) → ctx 1..1 (no cross)
        # total 8 tokens → 2 contexts; aligned: ceil(3/4)+ceil(3/4)+ceil(2/4)=3
        #   waste = (3*4 - 8) / 12 = 1/3
        (1, "s1", "a b c"),
        (2, "s1", "d e f"),
        (3, "s1", "g h"),
        # source s2: one 5-token doc → cum 5, spans ctx 0..1 (CROSS),
        # 2 contexts; aligned ceil(5/4)=2 → waste (8-5)/8
        (4, "s2", "a b c d e"),
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    df = df.withColumn("lang", df.source.substr(1, 1)).withColumn(
        "n_chars", F.length("text").cast("long")
    )
    # match corpus column order loosely; read_table projects explicitly
    path = str(tmp_path)
    df.select("doc_id", "text", "lang", "source", "n_chars").write.parquet(
        f"{path}/documents.parquet"
    )
    return path


def test_context_packing_hand_computed(spark, docs_dir):
    got = {
        r.source: r
        for r in context_packing_stats(spark, docs_dir, context_len=4).collect()
    }
    s1, s2 = got["s1"], got["s2"]
    assert (s1.n_docs, s1.total_tokens, s1.n_contexts, s1.crossing_docs) == (
        3, 8, 2, 1,
    )
    assert s1.crossing_frac == pytest.approx(1 / 3)
    assert s1.aligned_padding_waste_frac == pytest.approx(1 / 3)
    assert (s2.n_docs, s2.total_tokens, s2.n_contexts, s2.crossing_docs) == (
        1, 5, 2, 1,
    )
    assert s2.crossing_frac == 1.0
    assert s2.aligned_padding_waste_frac == pytest.approx(3 / 8)


def test_context_assignments_hand_computed(spark, docs_dir):
    """Same fixture, C=4: doc 2 (global tokens [3,6)) splits as [0,1) in
    context 0 and [1,3) in context 1; doc 4 (5 tokens) as [0,4)+[4,5)."""
    from graphdb_td2_spark.functions.packing import context_assignments

    got = {
        (r.doc_id, r.context_id): (r.tok_from, r.tok_to)
        for r in context_assignments(spark, docs_dir, context_len=4).collect()
    }
    assert got == {
        (1, 0): (0, 3),
        (2, 0): (0, 1),
        (2, 1): (1, 3),
        (3, 1): (0, 2),
        (4, 0): (0, 4),
        (4, 1): (4, 5),
    }


def test_source_mixing_weights_math(spark, tmp_path):
    """α=0.5 temperature: weights sum to ~1, small sources are up-weighted
    relative to proportional, big sources down-weighted."""
    from pyspark.sql import functions as F

    from graphdb_td2_spark.functions.sampling import source_mixing_weights

    rows = [(i, "big" if i < 90 else "small", "x y z") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    df = df.withColumn("lang", F.lit("en")).withColumn(
        "n_chars", F.length("text").cast("long")
    )
    df.write.parquet(f"{tmp_path}/documents.parquet")

    got = {r.source: r for r in source_mixing_weights(spark, str(tmp_path)).collect()}
    assert abs(got["big"].weight + got["small"].weight - 1.0) < 1e-9
    # sqrt flattening: big gets less than its 0.9 proportional share
    assert got["big"].weight < 0.9 and got["small"].weight > 0.1
    assert got["small"].rate_vs_proportional > 1.0 > got["big"].rate_vs_proportional


def test_packing_invariants_random_corpus(spark, tmp_path):
    """Packing invariants on a pseudo-random corpus: per-document
    assignment ranges are disjoint, contiguous, cover [0, n_tokens)
    exactly, and no per-context slice exceeds the context length."""
    import random

    from pyspark.sql import functions as F

    from graphdb_td2_spark.functions.packing import context_assignments

    rng = random.Random(406)
    rows = []
    for i in range(120):
        n = rng.randint(1, 40)
        rows.append((i, f"s{rng.randint(0, 3)}", " ".join("t" * 1 for _ in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    df = df.withColumn("lang", F.lit("en")).withColumn(
        "n_chars", F.length("text").cast("long")
    )
    df.write.parquet(f"{tmp_path}/documents.parquet")
    C = 16
    per_doc_tokens = {i: len(t.split()) for i, _, t in rows}

    asg = context_assignments(spark, str(tmp_path), context_len=C).collect()
    by_doc = {}
    for r in asg:
        assert 0 < r.tok_to - r.tok_from <= C
        by_doc.setdefault(r.doc_id, []).append((r.context_id, r.tok_from, r.tok_to))
    assert set(by_doc) == set(per_doc_tokens)
    for doc_id, parts in by_doc.items():
        parts.sort()
        # contiguous context ids, contiguous token ranges, full coverage
        ctxs = [c for c, _, _ in parts]
        assert ctxs == list(range(ctxs[0], ctxs[-1] + 1))
        assert parts[0][1] == 0
        assert parts[-1][2] == per_doc_tokens[doc_id]
        for (_, _, prev_to), (_, nxt_from, _) in zip(parts, parts[1:]):
            assert prev_to == nxt_from
