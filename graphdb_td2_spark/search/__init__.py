"""Full-text search tier [extension]: BM25 ranking over ``documents`` and
hybrid lexical+vector rerank joining ``embeddings``."""

from .bm25 import bm25_doc_topk, bm25_hybrid_topk, bm25_score_components
from .index import bm25_topk_from_index, build_search_index, drop_search_index

__all__ = [
    "bm25_doc_topk",
    "bm25_hybrid_topk",
    "bm25_score_components",
    "bm25_topk_from_index",
    "build_search_index",
    "drop_search_index",
]
