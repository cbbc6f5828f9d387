from .aho import AhoCorasick, build_automaton
from .tagger import MENTIONS_SCHEMA, tag_mentions, tag_pages_fused

__all__ = [
    "AhoCorasick",
    "build_automaton",
    "tag_mentions",
    "tag_pages_fused",
    "MENTIONS_SCHEMA",
]
