"""Deduplication operators over ``documents`` (SURVEY.md §7 Stage 5
[extension]): exact, MinHash+LSH, SimHash, n-gram Jaccard, and
embedding-cosine near-dup."""

from .clusters import dedup_clusters, duplicate_clusters
from .exact import dedup_token_savings, exact_dedup_stats
from .minhash import minhash_lsh_pairs, minhash_signatures
from .ngram import ngram_jaccard_pairs
from .simhash import simhash_docs
from .embedding import embedding_neardup_pairs

__all__ = [
    "dedup_clusters",
    "duplicate_clusters",
    "dedup_token_savings",
    "exact_dedup_stats",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash_docs",
    "embedding_neardup_pairs",
]
