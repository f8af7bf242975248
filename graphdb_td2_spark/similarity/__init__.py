"""Similarity search over embeddings (SURVEY.md §7 Stage 5 [extension]):
brute-force cosine top-k baseline + sign-LSH bucketed scale path."""

from .ann import (
    ann_topk_bruteforce,
    ann_topk_ivf,
    ann_topk_ivf_trained,
    ann_topk_lsh,
    sign_lsh_bucket,
    train_ivf_centroids,
)

__all__ = [
    "ann_topk_bruteforce",
    "ann_topk_ivf",
    "ann_topk_ivf_trained",
    "ann_topk_lsh",
    "sign_lsh_bucket",
    "train_ivf_centroids",
]
