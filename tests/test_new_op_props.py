"""Property-based reference models for the round-6 operators (SURVEY.md
§5 layer): BM25 scoring, blocked edit-distance matching, and capped
Bellman-Ford, each checked against an independent pure-Python model over
hypothesis-generated inputs. Spark examples use small budgets (each
example is a distributed job)."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from graphdb_td2_spark.dedup import er
from graphdb_td2_spark.search.bm25 import (
    B,
    FP_SCALE,
    K1,
    MIN_TERM_LEN,
    N_QUERY_DOCS,
    N_QUERY_TERMS,
    _bm25_scored,
)

VOCAB = ["cat", "dog", "fish", "bird", "ant", "bee", "owl", "fox"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=8),
    min_size=2,
    max_size=6,
)


def _py_bm25(doc_tokens):
    """Reference model of _bm25_scored: same query-term selection, same
    ratio idf, same fixed-point floor-before-sum."""
    n_docs = len(doc_tokens)
    dl = [len(t) for t in doc_tokens]
    avgdl = float(sum(dl)) / float(n_docs)
    out = {}
    for q in range(min(N_QUERY_DOCS, n_docs)):
        terms = sorted(
            {t for t in doc_tokens[q] if len(t) >= MIN_TERM_LEN}
        )[:N_QUERY_TERMS]
        for d in range(n_docs):
            if d == q:
                continue
            total, n_terms = 0, 0
            for term in terms:
                tf = doc_tokens[d].count(term)
                if tf == 0:
                    continue
                df = sum(1 for toks in doc_tokens if term in toks)
                idf = (float(n_docs) - float(df) + 0.5) / (float(df) + 0.5)
                tfpart = (float(tf) * (K1 + 1.0)) / (
                    float(tf) + K1 * ((1.0 - B) + B * (float(dl[d]) / avgdl))
                )
                total += math.floor(idf * tfpart * FP_SCALE)
                n_terms += 1
            if n_terms:
                out[(q, d)] = (total, n_terms)
    return out


@settings(max_examples=6, deadline=None)
@given(docs_strategy)
def test_bm25_matches_reference_model(spark, tmp_path_factory, docs):
    root = tmp_path_factory.mktemp("bm25prop")
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df = df.withColumn("lang", F.lit("en")).withColumn("source", F.lit("p")) \
          .withColumn("n_chars", F.length("text").cast("long"))
    df.write.mode("overwrite").parquet(str(root / "documents.parquet"))
    got = {
        (r["query_doc_id"], r["doc_id"]): (r["score_fp"], r["n_terms"])
        for r in _bm25_scored(spark, str(root)).collect()
    }
    assert got == _py_bm25(docs)


def _py_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


names_strategy = st.lists(
    st.tuples(
        st.sampled_from(["red", "blue", "hot"]),
        st.from_regex(r"[a-d]{3,6}", fullmatch=True),
        st.sampled_from(["Brand#1", "Brand#2"]),
    ),
    min_size=2,
    max_size=8,
)


@settings(max_examples=6, deadline=None)
@given(names_strategy)
def test_fuzzy_matches_reference_model(spark, tmp_path_factory, parts):
    root = tmp_path_factory.mktemp("erprop")
    rows = [(i, f"{adj} {noun}", brand) for i, (adj, noun, brand) in enumerate(parts)]
    spark.createDataFrame(
        rows, "p_partkey long, p_name string, p_brand string"
    ).write.mode("overwrite").parquet(str(root / "part.parquet"))

    # reference model: same blocking, same threshold, same top-k tiebreak
    want = {}
    for k_a, name_a, brand_a in [(r[0], r[1], r[2]) for r in rows]:
        block_a = (brand_a, name_a.split(" ")[0])
        cands = []
        for k_b, name_b, brand_b in [(r[0], r[1], r[2]) for r in rows]:
            if k_b == k_a or (brand_b, name_b.split(" ")[0]) != block_a:
                continue
            d = _py_lev(name_a, name_b)
            if d <= er.MAX_DISTANCE:
                cands.append((d, k_b))
        for rank, (d, k_b) in enumerate(sorted(cands)[: er.TOPK_MATCHES], 1):
            want[(k_a, k_b)] = (rank, d)

    got = {
        (r["p_partkey"], r["match_partkey"]): (r["rank"], r["distance"])
        for r in er.fuzzy_part_matches(spark, str(root)).collect()
    }
    assert got == want


edges_strategy = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 5), st.integers(1, 9)),
    min_size=1,
    max_size=10,
)


@settings(max_examples=6, deadline=None)
@given(edges_strategy, st.integers(1, 4))
def test_sssp_matches_capped_bellman_ford(spark, edges, rounds):
    from graphdb_td2_spark.graph.sssp import sssp_distances

    edges = [(a, b, w) for a, b, w in edges if a != b]
    if not edges:
        return
    ids = sorted({v for e in edges for v in e[:2]})
    seed = ids[0]

    # reference: round-capped Bellman-Ford on the min-collapsed
    # undirected graph
    und: dict[tuple[int, int], int] = {}
    for a, b, w in edges:
        for s, d in ((a, b), (b, a)):
            und[(s, d)] = min(und.get((s, d), w), w)
    dist = {v: (0 if v == seed else None) for v in ids}
    for _ in range(rounds):
        nxt = dict(dist)
        for (s, d), w in und.items():
            if dist[s] is not None:
                cand = dist[s] + w
                if nxt[d] is None or cand < nxt[d]:
                    nxt[d] = cand
        dist = nxt

    vertices = spark.createDataFrame([(str(i),) for i in ids], "id string")
    edges_df = spark.createDataFrame(
        [(str(a), str(b), w) for a, b, w in edges], "src string, dst string, w long"
    )
    got = {
        int(r["id"]): r["distance"]
        for r in sssp_distances(vertices, edges_df, str(seed), rounds=rounds).collect()
    }
    assert got == dist
