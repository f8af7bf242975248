"""Recommendation query suite — the Spark rebuild of the reference's
``GET /recs`` Cypher strategies (``app/main.py:23-135``; SURVEY.md §2.C/§3)."""

from .queries import (
    customer_brand_fallback,
    customer_cooccurrence,
    product_cooccurrence,
    product_same_brand,
    purchased_products,
    recommend,
)

__all__ = [
    "customer_brand_fallback",
    "customer_cooccurrence",
    "product_cooccurrence",
    "product_same_brand",
    "purchased_products",
    "recommend",
]
