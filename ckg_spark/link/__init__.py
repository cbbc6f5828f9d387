from .triples import (
    TRIPLES_COLUMNS,
    all_triples,
    comention_edges,
    hierarchy_edges,
    mention_edges,
    mentions_per_url,
    node_dictionary,
)

__all__ = [
    "TRIPLES_COLUMNS",
    "node_dictionary",
    "mentions_per_url",
    "mention_edges",
    "comention_edges",
    "hierarchy_edges",
    "all_triples",
]
