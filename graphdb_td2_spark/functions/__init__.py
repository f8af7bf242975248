"""Scalar-function layer (SURVEY.md §2.H + [extension] text/JSON/vector
functions for the LLM-data-pipeline operators). Everything here is built
from Catalyst built-ins (JVM-side, codegen'd) — no Python UDFs."""

from .json_props import event_type_stats, props_key_histogram
from .text import (
    doc_fingerprints,
    language_id,
    text_quality,
    token_stats,
    tokens_col,
)
from .vectors import cosine_similarity_q, quantize_embedding

__all__ = [
    "event_type_stats",
    "props_key_histogram",
    "doc_fingerprints",
    "language_id",
    "text_quality",
    "token_stats",
    "tokens_col",
    "cosine_similarity_q",
    "quantize_embedding",
]
