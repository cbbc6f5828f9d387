from .triples import (
    TRIPLES_COLUMNS,
    canonicalize_mentions,
    mention_edges,
    comention_edges,
    hierarchy_edges,
    all_triples,
)

__all__ = [
    "TRIPLES_COLUMNS",
    "canonicalize_mentions",
    "mention_edges",
    "comention_edges",
    "hierarchy_edges",
    "all_triples",
]
