"""source_diversity_index (functions/text.py) and
pagerank_convergence_curve (graph/queries.py) invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdb_td2_spark.functions.text import source_diversity_index, tokens_col
from graphdb_td2_spark.graph.queries import pagerank_convergence_curve
from graphdb_td2_spark.io import read_table


def test_diversity_bounds_and_token_accounting(spark, sf_dir):
    rows = source_diversity_index(spark, sf_dir).collect()
    assert rows
    docs = read_table(spark, sf_dir, "documents", ["source", "text"])
    total_tokens = docs.select(
        F.sum(F.size(tokens_col(F.col("text")))).cast("long")
    ).first()[0]
    assert sum(r["n_tokens"] for r in rows) == total_tokens
    for r in rows:
        assert 0 <= r["n_types"] <= r["n_tokens"]
        # collision mass is tight: 0 (all distinct) .. N(N-1) (one type)
        assert 0 <= r["collision_num"] <= r["n_tokens"] * (r["n_tokens"] - 1)
        if r["n_tokens"] > 1:
            assert 0.0 <= r["simpson_diversity"] <= 1.0


def test_diversity_extremes_on_fixture(spark, sf_dir, tmp_path):
    """All-same-token source → diversity 0; all-distinct source → 1."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table(
        {
            "doc_id": [0, 1],
            "text": ["x x x x", "a b c d"],
            "lang": ["en", "en"],
            "source": ["mono", "poly"],
            "n_chars": [7, 7],
        }
    )
    d = tmp_path / "fixture"
    d.mkdir()
    pq.write_table(docs, d / "documents.parquet")
    got = {r["source"]: r for r in source_diversity_index(spark, str(d)).collect()}
    assert got["mono"]["simpson_diversity"] == 0.0
    assert got["poly"]["simpson_diversity"] == 1.0


def test_pagerank_convergence_curve_decays(spark, sf_dir):
    rows = pagerank_convergence_curve(spark, sf_dir).collect()
    assert [r["iter"] for r in rows] == [1, 2, 3, 4, 5]
    deltas = [r["l1_delta_fp"] for r in rows]
    assert all(d >= 0 for d in deltas)
    # the power iteration contracts: movement must shrink monotonically
    # on this graph (damping 0.85 → geometric envelope)
    assert deltas[0] > deltas[-1]
    assert all(a >= b for a, b in zip(deltas, deltas[1:]))


def test_cohort_ltv_accounting(spark, sf_dir):
    """LTV triangle accounting: offset-0 actives equal the cohort size,
    total revenue equals the orders total, cumulative is a running sum,
    and LTV at each offset is cum div cohort_size."""
    from graphdb_td2_spark.operators.windows import cohort_ltv_curves

    rows = cohort_ltv_curves(spark, sf_dir).collect()
    assert rows
    orders = read_table(spark, sf_dir, "orders", ["o_custkey", "o_totalprice"])
    total_cents = orders.select(
        F.sum(
            F.expr("cast(cast(o_totalprice as decimal(14,2)) * 100 as bigint)")
        ).cast("long")
    ).first()[0]
    assert sum(r["revenue_cents"] for r in rows) == total_cents
    n_customers = orders.select("o_custkey").distinct().count()
    zero = [r for r in rows if r["month_offset"] == 0]
    assert sum(r["n_active_customers"] for r in zero) == n_customers
    by_cohort = {}
    for r in sorted(rows, key=lambda r: (str(r["cohort_month"]), r["month_offset"])):
        c = by_cohort.setdefault(r["cohort_month"], {"cum": 0, "size": None})
        if r["month_offset"] == 0:
            c["size"] = r["n_active_customers"]
        c["cum"] += r["revenue_cents"]
        assert r["cum_revenue_cents"] == c["cum"]
        assert r["ltv_per_customer_cents"] == c["cum"] // c["size"]


def test_discount_response_matches_python_ols(spark, sf_dir):
    """Per-brand slope equals a pure-Python OLS over the same exact
    integer (x, y) pairs."""
    from collections import defaultdict

    from graphdb_td2_spark.operators.relational import discount_quantity_response

    rows = {r["p_brand"]: r for r in discount_quantity_response(spark, sf_dir).collect()}
    li = read_table(spark, sf_dir, "lineitem", ["l_partkey", "l_discount", "l_quantity"])
    part = read_table(spark, sf_dir, "part", ["p_partkey", "p_brand"])
    data = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .select(
            "p_brand",
            F.expr("cast(cast(l_discount as decimal(6,4)) * 10000 as bigint)").alias("x"),
            F.expr("cast(cast(l_quantity as decimal(14,2)) * 100 as bigint)").alias("y"),
        )
        .collect()
    )
    by_brand = defaultdict(list)
    for r in data:
        by_brand[r["p_brand"]].append((r["x"], r["y"]))
    assert set(by_brand) == set(rows)
    for brand, pts in by_brand.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        r = rows[brand]
        assert r["n_lineitems"] == n
        det = n * sxx - sx * sx
        if det:
            assert r["slope_cq_per_bp"] == (n * sxy - sx * sy) / det
        else:
            assert r["slope_cq_per_bp"] is None
        assert r["mean_discount_bp"] == sx / n


def test_revenue_concentration_matches_python(spark, sf_dir):
    """Whale-curve cuts equal a pure-Python sort over exact cents."""
    from graphdb_td2_spark.operators.relational import (
        CONCENTRATION_PCTS,
        customer_revenue_concentration,
    )

    rows = {r["pct"]: r for r in customer_revenue_concentration(spark, sf_dir).collect()}
    orders = read_table(spark, sf_dir, "orders", ["o_custkey", "o_totalprice"])
    spend = {}
    for r in orders.collect():
        c = int(round(float(r["o_totalprice"]) * 100))
        spend[r["o_custkey"]] = spend.get(r["o_custkey"], 0) + c
    ordered = sorted(spend.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(spend.values())
    n = len(ordered)
    assert set(rows) == set(CONCENTRATION_PCTS)
    for p in CONCENTRATION_PCTS:
        k = max((n * p + 99) // 100, 1)
        cum = sum(v for _, v in ordered[:k])
        r = rows[p]
        assert r["n_top_customers"] == k
        assert r["revenue_cents"] == cum
        assert r["revenue_share"] == cum / float(total)
    # the curve is concave: larger p never decreases the share
    shares = [rows[p]["revenue_share"] for p in sorted(CONCENTRATION_PCTS)]
    assert shares == sorted(shares) and rows[100]["revenue_share"] == 1.0


def test_monthly_seasonal_index_accounting(spark, sf_dir):
    from graphdb_td2_spark.operators.timeseries import monthly_seasonal_index

    rows = monthly_seasonal_index(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 12
    assert all(1 <= r["month_of_year"] <= 12 for r in rows)
    total = sum(r["revenue_cents"] for r in rows)
    for r in rows:
        assert r["seasonal_index"] == (r["revenue_cents"] * 12) / total
    # indices average to ~1 when all 12 months are present
    if len(rows) == 12:
        assert abs(sum(r["seasonal_index"] for r in rows) / 12 - 1.0) < 1e-9


def test_top_confidence_rules_are_valid(spark, sf_dir):
    from graphdb_td2_spark.graph.build import contains_pairs
    from graphdb_td2_spark.recs.itemsets import (
        RULE_MIN_SUPPORT,
        RULE_TOP_K,
        top_confidence_rules,
    )

    rows = top_confidence_rules(spark, sf_dir).collect()
    assert 0 < len(rows) <= RULE_TOP_K
    li = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    baskets = {}
    for r in contains_pairs(li).collect():
        baskets.setdefault(r["order_id"], set()).add(r["product_id"])
    confs = [r["confidence"] for r in rows]
    assert confs == sorted(confs, reverse=True)
    for r in rows:
        n_both = sum(
            1
            for b in baskets.values()
            if r["antecedent"] in b and r["consequent"] in b
        )
        n_ant = sum(1 for b in baskets.values() if r["antecedent"] in b)
        assert r["n_both"] == n_both >= RULE_MIN_SUPPORT
        assert r["n_antecedent"] == n_ant
        assert r["confidence"] == n_both / n_ant


def test_churn_hazard_accounting(spark, sf_dir):
    from graphdb_td2_spark.operators.windows import churn_hazard_curve

    rows = churn_hazard_curve(spark, sf_dir).collect()
    assert rows
    n_customers = read_table(spark, sf_dir, "orders", ["o_custkey"]).select(
        "o_custkey"
    ).distinct().count()
    # the smallest observed tenure has EVERY customer at risk (suffix
    # sum); at-risk counts never increase with tenure
    assert rows[0]["n_at_risk"] == n_customers
    at_risk = [r["n_at_risk"] for r in rows]
    assert at_risk == sorted(at_risk, reverse=True)
    for r in rows:
        assert 0 <= r["n_churned"] <= r["n_at_risk"]
        assert r["hazard"] == r["n_churned"] / r["n_at_risk"]


def test_frequent_sequences_match_bruteforce(spark, sf_dir):
    """Exists-subsequence supports equal a brute-force per-user scan."""
    from itertools import product as iproduct

    from graphdb_td2_spark.operators.transitions import (
        SEQ_TOP_K,
        frequent_event_sequences,
    )

    rows = frequent_event_sequences(spark, sf_dir).collect()
    assert 0 < len(rows) <= SEQ_TOP_K
    ev = read_table(spark, sf_dir, "events", ["user_id", "ts", "event_type"]).collect()
    by_user = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append((r["ts"], r["event_type"]))
    types = sorted({r["event_type"] for r in ev})
    pair_n = {}
    triple_n = {}
    for seq_events in by_user.values():
        firsts, lasts = {}, {}
        for ts, t in seq_events:
            if t not in firsts or ts < firsts[t]:
                firsts[t] = ts
            if t not in lasts or ts > lasts[t]:
                lasts[t] = ts
        for a, c in iproduct(types, types):
            if a in firsts and c in lasts and firsts[a] < lasts[c]:
                pair_n[(a, c)] = pair_n.get((a, c), 0) + 1
                mids = {t for ts, t in seq_events if firsts[a] < ts < lasts[c]}
                for b in mids:
                    triple_n[(a, b, c)] = triple_n.get((a, b, c), 0) + 1
    for r in rows:
        parts = r["seq"].split(">")
        if r["seq_len"] == 2:
            assert pair_n[(parts[0], parts[1])] == r["n_users"]
        else:
            assert triple_n[(parts[0], parts[1], parts[2])] == r["n_users"]
    # the list really is the global top: no brute-force support exceeds
    # the smallest reported one among sequences not reported
    reported = {r["seq"] for r in rows}
    floor = min(r["n_users"] for r in rows)
    others = [
        v for k, v in list(pair_n.items()) + list(triple_n.items())
        if ">".join(k) not in reported
    ]
    assert all(v <= floor for v in others)


def test_tokenizer_fertility_accounting(spark, sf_dir):
    from graphdb_td2_spark.functions.text import (
        bpe_ish_token_count,
        tokenizer_fertility_by_lang,
    )

    rows = tokenizer_fertility_by_lang(spark, sf_dir).collect()
    assert rows
    docs = read_table(spark, sf_dir, "documents", ["lang", "text"])
    totals = docs.select(
        F.count(F.lit(1)).cast("long"),
        F.sum(F.size(tokens_col(F.col("text")))).cast("long"),
        F.sum(bpe_ish_token_count(F.col("text"))).cast("long"),
    ).first()
    assert sum(r["n_docs"] for r in rows) == totals[0]
    assert sum(r["n_words"] for r in rows) == totals[1]
    assert sum(r["n_subwords"] for r in rows) == totals[2]
    for r in rows:
        assert r["fertility"] == r["n_subwords"] / r["n_words"]
        assert r["fertility"] > 0


def test_product_skyline_dominance(spark, sf_dir):
    """Frontier members are mutually non-dominating and every non-member
    is dominated by some member (brute-force check)."""
    from graphdb_td2_spark.operators.relational import product_skyline

    sky = product_skyline(spark, sf_dir).collect()
    assert sky
    li = read_table(spark, sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    part = read_table(spark, sf_dir, "part", ["p_partkey", "p_retailprice"])
    pop = (
        li.select("l_orderkey", "l_partkey").distinct()
        .groupBy("l_partkey").count().collect()
    )
    prices = {
        r["p_partkey"]: int(round(float(r["p_retailprice"]) * 100))
        for r in part.collect()
    }
    pts = {r["l_partkey"]: (r["count"], prices[r["l_partkey"]]) for r in pop}

    def dominates(a, b):
        return (a[0] >= b[0] and a[1] <= b[1]) and (a[0] > b[0] or a[1] < b[1])

    members = {r["product_id"] for r in sky}
    for r in sky:
        assert pts[r["product_id"]] == (r["n_orders"], r["price_cents"])
    for m in members:
        assert not any(dominates(pts[o], pts[m]) for o in pts if o != m)
    for o, p in pts.items():
        if o not in members:
            assert any(dominates(pts[m], p) for m in members)


def test_churn_hazard_empty_orders_returns_empty(spark, tmp_path):
    """Degenerate empty-orders input → empty result with the standard
    schema, not a date'None' AnalysisException (ADVICE r8)."""
    from graphdb_td2_spark.operators.windows import churn_hazard_curve
    from graphdb_td2_spark.schemas import CORPUS

    sf = str(tmp_path / "sf_empty")
    spark.createDataFrame([], CORPUS["orders"]).write.parquet(f"{sf}/orders.parquet")
    out = churn_hazard_curve(spark, sf)
    assert out.count() == 0
    assert out.columns == ["tenure_month", "n_at_risk", "n_churned", "hazard"]
