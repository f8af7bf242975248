"""Full-text search tier [extension]: BM25 ranking over ``documents`` and
hybrid lexical+vector rerank joining ``embeddings``."""

from .bm25 import bm25_doc_topk, bm25_hybrid_topk, bm25_score_components

__all__ = ["bm25_doc_topk", "bm25_hybrid_topk", "bm25_score_components"]
