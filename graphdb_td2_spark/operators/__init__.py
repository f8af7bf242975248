"""Relational operator layer (SURVEY.md §7 Stage 1): the §2.B/C/D/F/G
inventory plus the [extension] analytics the reference gets for free from
Spark SQL (grouping sets, window functions, set ops)."""

from .relational import (
    brand_revenue,
    customer_activity_setops,
    market_segment_stats,
    order_priority_rollup,
    pricing_summary,
    region_sales,
    top_customers,
)
from .windows import sessionize, top_events_per_user, user_running_value

__all__ = [
    "brand_revenue",
    "customer_activity_setops",
    "market_segment_stats",
    "order_priority_rollup",
    "pricing_summary",
    "region_sales",
    "top_customers",
    "sessionize",
    "top_events_per_user",
    "user_running_value",
]
