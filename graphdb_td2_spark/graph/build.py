"""Graph construction — the Spark rebuild of the reference ETL load phase
(``app/etl.py:166-279``; SURVEY.md §2.E rows E2-E9).

The reference materializes a Neo4j property graph with batched
``UNWIND … MERGE`` Cypher. Here the graph is a pair of DataFrames:

- ``vertices(id, label, name, category_id, ts)``
- ``edges(src, dst, rel_type, quantity)``

and "the ETL" is a deterministic declarative plan: per-label vertex
projections with ``dropDuplicates`` standing in for ``MERGE``'s upsert
idempotency (SURVEY §2 D4), per-type edge builds with inner-join endpoint
resolution standing in for the double-``MATCH``-before-``MERGE`` orphan drop
(C7, ``app/etl.py:199-202, 240-243, 273-276``).

Reference→corpus mapping (FIXTURES.md §"Mapping"):

==============  =====================  =======================================
reference        corpus                 notes
==============  =====================  =======================================
customers        ``customer``           ``c_custkey`` ≙ Customer.id
products         ``part``               ``p_partkey`` ≙ Product.id
categories       distinct ``p_brand``   the category dimension is derived
orders           ``orders``             ``o_orderkey`` / ``o_custkey``
order_items      ``lineitem``           (l_orderkey, l_partkey, l_quantity)
events           ``events``             product ref = ``props`` JSON key ``k``
==============  =====================  =======================================

Reproduced reference semantics (intentional, see SURVEY §1.1 "lossiness"):

- CONTAINS edges are MERGE-deduped per (order, product); the ``quantity``
  property is last-write-wins (``SET r.quantity``, ``app/etl.py:243-244``) —
  made deterministic here as "value from the highest ``l_linenumber``"
  (``max_by``), a documented tightening of D5.
- Event edges drop id/ts, lowercase the type, keep only
  {view, click, add_to_cart} (``app/etl.py:250-262``) and collapse repeats
  into one property-less edge per (customer, product, type)
  (``app/etl.py:272-278``).
- Order vertices survive a missing customer; the PLACED edge does not
  (``MERGE`` node then ``MATCH`` customer, ``app/etl.py:225-231``).

Scale notes: every endpoint-resolution join has a dimension-sized side
(customer/part/brand) → Catalyst broadcast-hash-joins them; the only big-big
operation is the CONTAINS dedup, a single hash aggregate over
(l_orderkey, l_partkey) that AQE coalesces. Nothing here collects to the
driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

# app/etl.py:250-254 — event type → relationship type map (E8).
EVENT_TYPE_TO_REL: dict[str, str] = {
    "view": "VIEWED",
    "click": "CLICKED",
    "add_to_cart": "ADDED_TO_CART",
}


@dataclass(frozen=True)
class GraphFrames:
    """A property graph encoded as two DataFrames (SURVEY §1.3)."""

    vertices: DataFrame  # id, label, name, category_id, ts
    edges: DataFrame  # src, dst, rel_type, quantity


# --- adjacency views (unprefixed keys — the recs hot path) --------------------


def contains_pairs(lineitem: DataFrame) -> DataFrame:
    """Distinct (order_id, product_id) CONTAINS pairs — D4 MERGE dedup
    (``app/etl.py:243``). The property-free view used by pattern queries."""
    return (
        lineitem.select(
            F.col("l_orderkey").alias("order_id"),
            F.col("l_partkey").alias("product_id"),
        )
        .distinct()
    )


def contains_edges(lineitem: DataFrame) -> DataFrame:
    """CONTAINS with its ``quantity`` property: MERGE dedup per
    (order, product) + last-write-wins ``SET r.quantity``
    (``app/etl.py:239-246``).

    Determinism: the corpus contains duplicated (order, product,
    linenumber) rows with DIFFERENT quantities, so ``l_linenumber`` alone
    is not a total order — ``max_by`` ties would be engine- and
    partitioning-arbitrary. The composite key ``linenumber·10^6 +
    quantity`` breaks such ties by quantity (remaining ties imply equal
    quantity, making the pick immaterial); the DuckDB oracle uses the
    identical scalar expression."""
    return (
        lineitem.groupBy(
            F.col("l_orderkey").alias("order_id"),
            F.col("l_partkey").alias("product_id"),
        )
        .agg(
            F.max_by(
                "l_quantity",
                F.col("l_linenumber") * F.lit(1_000_000.0) + F.col("l_quantity"),
            ).alias("quantity")
        )
    )


def placed_edges(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """PLACED edges: order→customer FK resolution; rows with a missing
    customer are dropped (``MATCH`` before ``MERGE``, ``app/etl.py:228-231``).
    Customer is dimension-sized → broadcast join. Endpoint keys are
    deduplicated — MERGE parity: MATCH hits one node per key (D4)."""
    return (
        orders.select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_custkey").alias("customer_id"),
        )
        .join(
            F.broadcast(
                customer.select(F.col("c_custkey").alias("customer_id")).distinct()
            ),
            "customer_id",
        )
        .select("customer_id", "order_id")
    )


def event_product_ref(events: DataFrame) -> DataFrame:
    """events + a ``product_id`` column extracted from the ``props`` JSON key
    ``k`` — the corpus stand-in for the reference's ``events.product_id``
    (``01_schema.sql:36``; FIXTURES.md mapping)."""
    return events.withColumn(
        "product_id", F.get_json_object("props", "$.k").cast("long")
    )


def event_typed_dedup(events: DataFrame) -> DataFrame:
    """B4 + E8 + E9 without endpoint resolution: lowercase + domain filter
    (unknown types silently dropped, ``app/etl.py:258-262``), event-type →
    rel-type map, dedup per (customer, product, rel_type) (property-less
    ``MERGE``, ``app/etl.py:272-278``)."""
    typed = (
        event_product_ref(events)
        .withColumn("event_type", F.lower("event_type"))
        .filter(F.col("event_type").isin(*EVENT_TYPE_TO_REL))
    )
    rel = F.create_map(
        *[x for k, v in EVENT_TYPE_TO_REL.items() for x in (F.lit(k), F.lit(v))]
    )[F.col("event_type")]
    return typed.select(
        F.col("user_id").alias("customer_id"),
        "product_id",
        rel.alias("rel_type"),
    ).dropDuplicates(["customer_id", "product_id", "rel_type"])


def event_edges(
    events: DataFrame, customer: DataFrame, part: DataFrame
) -> DataFrame:
    """Event edges (E8/E9 + B4) with inner-join endpoint resolution (C7)."""
    return (
        event_typed_dedup(events)
        .join(
            F.broadcast(
                customer.select(F.col("c_custkey").alias("customer_id")).distinct()
            ),
            "customer_id",
        )
        .join(
            F.broadcast(part.select(F.col("p_partkey").alias("product_id")).distinct()),
            "product_id",
        )
        .select("customer_id", "product_id", "rel_type")
    )


# --- full property-graph build (prefixed string ids, one frame each) ----------

_V_COLS = ("id", "label", "name", "category_id", "ts")


def _vid(label_prefix: str, col) -> F.Column:
    return F.concat(F.lit(label_prefix), F.lit(":"), col.cast("string"))


def build_graph(tables: dict[str, DataFrame]) -> GraphFrames:
    """E2-E9 as one deterministic batch plan over the corpus tables.

    Vertex ids are label-prefixed strings (``C:1``, ``P:1``, ``O:1``,
    ``CAT:Brand#13``) because corpus keys collide across labels — the
    reference's TEXT ids (C1/P1/O1) are globally unique by construction.
    Re-running the build yields identical frames (MERGE idempotency, §5).
    """
    customer, part, orders, lineitem, events = (
        tables["customer"],
        tables["part"],
        tables["orders"],
        tables["lineitem"],
        tables["events"],
    )

    null_ts = F.lit(None).cast("timestamp")
    null_str = F.lit(None).cast("string")

    # E5: Customer vertices (dedup ≙ MERGE on id, app/etl.py:209-218).
    v_customer = (
        customer.select(
            _vid("C", F.col("c_custkey")).alias("id"),
            F.lit("Customer").alias("label"),
            F.col("c_name").alias("name"),
            null_str.alias("category_id"),
            null_ts.alias("ts"),
        )
        .dropDuplicates(["id"])
    )
    # E3: Product vertices (app/etl.py:183-192); price intentionally dropped
    # for parity (app/etl.py:145-147 — SURVEY §1.1 lossiness).
    v_product = (
        part.select(
            _vid("P", F.col("p_partkey")).alias("id"),
            F.lit("Product").alias("label"),
            F.col("p_name").alias("name"),
            F.col("p_brand").alias("category_id"),
            null_ts.alias("ts"),
        )
        .dropDuplicates(["id"])
    )
    # E2: Category vertices — the derived brand dimension (app/etl.py:169-179).
    v_category = (
        part.select(F.col("p_brand"))
        .distinct()
        .select(
            _vid("CAT", F.col("p_brand")).alias("id"),
            F.lit("Category").alias("label"),
            F.col("p_brand").alias("name"),
            null_str.alias("category_id"),
            null_ts.alias("ts"),
        )
    )
    # E6: Order vertices — survive a missing customer (app/etl.py:225-227).
    v_order = (
        orders.select(
            _vid("O", F.col("o_orderkey")).alias("id"),
            F.lit("Order").alias("label"),
            null_str.alias("name"),
            null_str.alias("category_id"),
            F.col("o_orderdate").alias("ts"),
        )
        .dropDuplicates(["id"])
    )
    vertices = v_customer.unionByName(v_product).unionByName(v_category).unionByName(v_order)

    null_qty = F.lit(None).cast("double")

    # E4: IN_CATEGORY (inner-join orphan drop, app/etl.py:199-204). The
    # category side is derived from part itself, so the join always matches —
    # the shape is kept for semantic parity with C7.
    e_in_category = (
        part.join(
            F.broadcast(part.select("p_brand").distinct()), "p_brand"
        )
        .select(
            _vid("P", F.col("p_partkey")).alias("src"),
            _vid("CAT", F.col("p_brand")).alias("dst"),
            F.lit("IN_CATEGORY").alias("rel_type"),
            null_qty.alias("quantity"),
        )
    )
    # E6: PLACED.
    e_placed = placed_edges(orders, customer).select(
        _vid("C", F.col("customer_id")).alias("src"),
        _vid("O", F.col("order_id")).alias("dst"),
        F.lit("PLACED").alias("rel_type"),
        null_qty.alias("quantity"),
    )
    # E7: CONTAINS with quantity; endpoints resolved against orders/part (C7).
    e_contains = (
        contains_edges(lineitem)
        .join(
            orders.select(F.col("o_orderkey").alias("order_id")).distinct(),
            "order_id",
        )
        .join(
            F.broadcast(part.select(F.col("p_partkey").alias("product_id")).distinct()),
            "product_id",
        )
        .select(
            _vid("O", F.col("order_id")).alias("src"),
            _vid("P", F.col("product_id")).alias("dst"),
            F.lit("CONTAINS").alias("rel_type"),
            F.col("quantity").cast("double").alias("quantity"),
        )
    )
    # E8/E9: event edges.
    e_events = event_edges(events, customer, part).select(
        _vid("C", F.col("customer_id")).alias("src"),
        _vid("P", F.col("product_id")).alias("dst"),
        F.col("rel_type"),
        null_qty.alias("quantity"),
    )
    edges = (
        e_in_category.unionByName(e_placed).unionByName(e_contains).unionByName(e_events)
    )
    return GraphFrames(vertices=vertices, edges=edges)


def build_graph_from_reference_tables(tables: dict[str, DataFrame]) -> GraphFrames:
    """E2-E9 over the reference's own shop schema (FIXTURES.md §A seed) —
    used by the golden-answer unit tests. Same semantics as :func:`build_graph`
    but ids are already globally unique TEXT keys, so no prefixing."""
    customers, categories, products, orders, order_items, events = (
        tables["customers"],
        tables["categories"],
        tables["products"],
        tables["orders"],
        tables["order_items"],
        tables["events"],
    )
    null_ts = F.lit(None).cast("timestamp")
    null_str = F.lit(None).cast("string")
    null_qty = F.lit(None).cast("double")

    v = (
        customers.select(
            F.col("id"),
            F.lit("Customer").alias("label"),
            F.col("name"),
            null_str.alias("category_id"),
            null_ts.alias("ts"),
        )
        .dropDuplicates(["id"])
        .unionByName(
            products.select(
                F.col("id"),
                F.lit("Product").alias("label"),
                F.col("name"),
                F.col("category_id"),
                null_ts.alias("ts"),
            ).dropDuplicates(["id"])
        )
        .unionByName(
            categories.select(
                F.col("id"),
                F.lit("Category").alias("label"),
                F.col("name"),
                null_str.alias("category_id"),
                null_ts.alias("ts"),
            ).dropDuplicates(["id"])
        )
        .unionByName(
            orders.select(
                F.col("id"),
                F.lit("Order").alias("label"),
                null_str.alias("name"),
                null_str.alias("category_id"),
                F.col("ts"),
            ).dropDuplicates(["id"])
        )
    )

    e_cat = (
        products.alias("p")
        .join(categories.alias("c"), F.col("p.category_id") == F.col("c.id"))
        .select(
            F.col("p.id").alias("src"),
            F.col("c.id").alias("dst"),
            F.lit("IN_CATEGORY").alias("rel_type"),
            null_qty.alias("quantity"),
        )
        .dropDuplicates(["src", "dst", "rel_type"])
    )
    e_placed = (
        orders.alias("o")
        .join(customers.alias("c"), F.col("o.customer_id") == F.col("c.id"))
        .select(
            F.col("c.id").alias("src"),
            F.col("o.id").alias("dst"),
            F.lit("PLACED").alias("rel_type"),
            null_qty.alias("quantity"),
        )
        .dropDuplicates(["src", "dst", "rel_type"])
    )
    e_contains = (
        order_items.groupBy("order_id", "product_id")
        .agg(F.last("quantity").alias("quantity"))
        # endpoints are the MERGE-deduped nodes (MATCH hits one node even if
        # the source row repeated), hence distinct keys
        .join(orders.select(F.col("id").alias("order_id")).distinct(), "order_id")
        .join(products.select(F.col("id").alias("product_id")).distinct(), "product_id")
        .select(
            F.col("order_id").alias("src"),
            F.col("product_id").alias("dst"),
            F.lit("CONTAINS").alias("rel_type"),
            F.col("quantity").cast("double").alias("quantity"),
        )
    )
    rel = F.create_map(
        *[x for k, v2 in EVENT_TYPE_TO_REL.items() for x in (F.lit(k), F.lit(v2))]
    )[F.lower(F.col("event_type"))]
    e_events = (
        events.withColumn("event_type", F.lower("event_type"))
        .filter(F.col("event_type").isin(*EVENT_TYPE_TO_REL))
        .select(
            F.col("customer_id").alias("src"),
            F.col("product_id").alias("dst"),
            rel.alias("rel_type"),
        )
        .dropDuplicates(["src", "dst", "rel_type"])
        .join(customers.select(F.col("id").alias("src")).distinct(), "src")
        .join(products.select(F.col("id").alias("dst")).distinct(), "dst")
        .select("src", "dst", "rel_type", null_qty.alias("quantity"))
    )
    edges = e_cat.unionByName(e_placed).unionByName(e_contains).unionByName(e_events)
    return GraphFrames(vertices=v, edges=edges)


def run_etl(spark, sf_dir: str, out_dir: str | None = None) -> dict:
    """The reference's ``GET /etl`` pipeline (``app/main.py:16-19`` →
    ``app/etl.py:108-288``) as one batch job: build the property graph,
    materialize it (the load effect the checks container asserts on,
    ``docker-compose.yml:94-102``), and print the ``"ETL done."`` sentinel
    (E10, ``app/etl.py:288``). Returns ``{"ok": True, counts}``.

    ``out_dir``: when given, the graph is persisted to the lake —
    vertices partitioned by ``label``, edges by ``rel_type`` (the Neo4j
    write of the reference, re-expressed as the layout every downstream
    label/type-filtered scan partition-prunes against). Without it the
    load effect is the counted materialization only."""
    import logging

    log = logging.getLogger("graphdb_td2_spark")
    from ..io import load_tables

    g = build_graph(load_tables(spark, sf_dir))
    if out_dir is not None:
        from ..sources.sinks import write_partitioned

        write_partitioned(g.vertices, f"{out_dir}/vertices", ["label"])
        write_partitioned(g.edges, f"{out_dir}/edges", ["rel_type"])
        g = GraphFrames(
            vertices=spark.read.parquet(f"{out_dir}/vertices"),
            edges=spark.read.parquet(f"{out_dir}/edges"),
        )
    n_vertices = g.vertices.count()
    n_edges = g.edges.count()
    log.info("[ETL] loaded %d vertices, %d edges", n_vertices, n_edges)
    print("ETL done.")
    return {"ok": True, "n_vertices": n_vertices, "n_edges": n_edges}
