"""Session-cache hygiene (ADVICE r12): stopped-session entries evict on
access across every lake-artifact memo, and the trained-index memos key
on the ACTUAL corpus argument (plan semanticHash), not just the caller's
cache_key string."""

from __future__ import annotations

from graphdb_td2_spark.caching import evict_stopped, session_stopped


class _DeadSession:
    """Anything whose context introspection fails counts as stopped."""

    @property
    def sparkContext(self):  # noqa: N802 - mimics SparkSession
        raise RuntimeError("stopped")


def test_session_stopped_on_dead_session(spark):
    assert session_stopped(_DeadSession()) is True
    assert session_stopped(spark) is False


def test_evict_stopped_drops_only_dead_entries(spark):
    cache = {"dead": (_DeadSession(), 1), "live": (spark, 2)}
    evict_stopped(cache, lambda v: v[0])
    assert list(cache) == ["live"]


def test_lake_caches_prune_dead_sessions(spark, sf_dir, monkeypatch):
    import graphdb_td2_spark.graph.queries as q

    dead_g = type("G", (), {"vertices": None})()

    class _DeadFrame:
        @property
        def sparkSession(self):
            raise RuntimeError("stopped")

    dead_g.vertices = _DeadFrame()
    monkeypatch.setitem(q._GRAPH_CACHE, ("dead-app", "x"), dead_g)
    q.cached_graph(spark, sf_dir)
    assert ("dead-app", "x") not in q._GRAPH_CACHE


def test_trained_centroids_key_on_actual_corpus(spark):
    """Two different corpora under the SAME cache_key must train two
    different centroid sets — the memo key carries the corpus plan's
    semanticHash (ADVICE r12: the key used to trust the caller)."""
    from graphdb_td2_spark.similarity.ann import train_ivf_centroids

    corpus_a = spark.createDataFrame(
        [(i, [i * 10, 5 + (i % 3)]) for i in range(1, 9)],
        "vec_id long, qe array<long>",
    )
    corpus_b = corpus_a.filter("vec_id >= 4")
    cents_a = train_ivf_centroids(
        spark, corpus_a, n_cells=2, n_iter=1, cache_key="same-key"
    ).collect()
    cents_b = train_ivf_centroids(
        spark, corpus_b, n_cells=2, n_iter=1, cache_key="same-key"
    ).collect()
    assert sorted(map(tuple, cents_a)) != sorted(map(tuple, cents_b))
    # and the memo still works: same corpus + key returns the same rows
    again = train_ivf_centroids(
        spark, corpus_a, n_cells=2, n_iter=1, cache_key="same-key"
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, cents_a))
