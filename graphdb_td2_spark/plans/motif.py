"""Declarative motif patterns → Catalyst join chains (SURVEY.md §7 Stage 3).

Every graph query in the reference is a 1–4-hop Cypher pattern
(``app/main.py:51-123``); this module keeps that declarativeness without a
Cypher engine. A pattern like::

    (o)-[:CONTAINS]->(p); (o)-[:CONTAINS]->(q)

compiles to a chain of equi-joins over the ``edges`` DataFrame
``(src, dst, rel_type, …)``, producing one id column per named node. The
output is an ordinary DataFrame, so Catalyst plans it like any other join
tree — broadcast for tiny sides, sort-merge for big ones, AQE for skew —
which is the whole point: the motif layer adds zero physical machinery.

Pattern-negation (the reference's ``WHERE NOT (c)-[:PLACED]->…`` anti-join,
``app/main.py:92,114``) is ``exclude_motif`` — a ``left_anti`` join against
a compiled motif.

Scale notes: each hop is one equi-join on an id column; Catalyst reorders /
broadcasts as statistics dictate. Path multiplicity is preserved (no
dedup), matching Cypher path-count semantics (D1) — callers dedup
explicitly when they mean sets.
"""

from __future__ import annotations

import re
from functools import reduce

from pyspark.sql import DataFrame, functions as F

_NODE = re.compile(r"\((\w+)\)")
_EDGE_FWD = re.compile(r"-\[:(\w+)\]->")
_EDGE_BWD = re.compile(r"<-\[:(\w+)\]-")


def _parse_path(path: str) -> list[tuple[str, str, str]]:
    """One path atom → [(src_name, rel_type, dst_name), …]."""
    pos, out = 0, []
    m = _NODE.match(path, pos)
    if not m:
        raise ValueError(f"pattern must start with a (node): {path!r}")
    prev, pos = m.group(1), m.end()
    while pos < len(path):
        fwd = _EDGE_FWD.match(path, pos)
        bwd = _EDGE_BWD.match(path, pos)
        edge = fwd or bwd
        if not edge:
            raise ValueError(f"expected -[:REL]-> or <-[:REL]- at {path[pos:]!r}")
        pos = edge.end()
        node = _NODE.match(path, pos)
        if not node:
            raise ValueError(f"expected (node) at {path[pos:]!r}")
        name, pos = node.group(1), node.end()
        out.append((prev, edge.group(1), name) if fwd else (name, edge.group(1), prev))
        prev = name
    return out


def parse_pattern(pattern: str) -> list[tuple[str, str, str]]:
    """Full pattern (``;``-separated paths) → edge triple list."""
    triples: list[tuple[str, str, str]] = []
    for path in pattern.split(";"):
        path = path.strip().replace(" ", "")
        if path:
            triples.extend(_parse_path(path))
    if not triples:
        raise ValueError(f"empty pattern: {pattern!r}")
    return triples


def find_motif(edges: DataFrame, pattern: str) -> DataFrame:
    """Compile ``pattern`` against ``edges(src, dst, rel_type)`` into a
    DataFrame with one id column per node name. Preserves path
    multiplicity (Cypher path semantics — no implicit dedup)."""
    triples = parse_pattern(pattern)

    def hop(su: str, rel: str, dv: str) -> DataFrame:
        return edges.filter(F.col("rel_type") == rel).select(
            F.col("src").alias(su), F.col("dst").alias(dv)
        )

    def join_step(acc: DataFrame, triple: tuple[str, str, str]) -> DataFrame:
        step = hop(*triple)
        shared = [c for c in step.columns if c in acc.columns]
        if not shared:
            raise ValueError(
                f"disconnected pattern at {triple}: no shared node with the "
                "prefix — order paths so each shares a node with what came before"
            )
        return acc.join(step, on=shared)

    first, rest = triples[0], triples[1:]
    return reduce(join_step, rest, hop(*first))


def exclude_motif(
    df: DataFrame, edges: DataFrame, pattern: str, on: list[str]
) -> DataFrame:
    """Pattern negation: drop rows of ``df`` whose ``on`` columns match any
    binding of ``pattern`` (the reference's ``WHERE NOT (…)`` anti-join,
    C5)."""
    matches = find_motif(edges, pattern).select(*on).distinct()
    return df.join(matches, on=on, how="left_anti")
