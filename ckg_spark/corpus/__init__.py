from .vocab import VocabConfig, generate_vocab, vocab_dataframes
from .pages import PagesConfig, generate_pages_df

__all__ = [
    "VocabConfig",
    "generate_vocab",
    "vocab_dataframes",
    "PagesConfig",
    "generate_pages_df",
]
