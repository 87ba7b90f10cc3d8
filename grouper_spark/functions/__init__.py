from .vector import cosine_similarity, dot, l2_norm, l2_normalize
from .text import (
    money,
    tokens,
    token_count,
    word_shingles,
    normalized_text,
)

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_norm",
    "l2_normalize",
    "money",
    "tokens",
    "token_count",
    "word_shingles",
    "normalized_text",
]
