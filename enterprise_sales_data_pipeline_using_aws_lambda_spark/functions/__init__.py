from .dates import format_date, parse_mdY
from .text import char_ngrams, simple_word_count, stable_hash64

__all__ = [
    "parse_mdY",
    "format_date",
    "char_ngrams",
    "simple_word_count",
    "stable_hash64",
]
