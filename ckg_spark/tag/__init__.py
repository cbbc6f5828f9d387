from .aho import AhoCorasick, build_automaton
from .tagger import tag_mentions, MENTIONS_SCHEMA

__all__ = ["AhoCorasick", "build_automaton", "tag_mentions", "MENTIONS_SCHEMA"]
