from .triples import (
    TRIPLES_COLUMNS,
    all_triples,
    comention_edges,
    hierarchy_edges,
    mention_edges,
    mentions_per_url,
)

__all__ = [
    "TRIPLES_COLUMNS",
    "mentions_per_url",
    "mention_edges",
    "comention_edges",
    "hierarchy_edges",
    "all_triples",
]
