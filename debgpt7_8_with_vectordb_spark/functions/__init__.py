from .vector import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
    l2_normalize,
    truncate_dim,
    vector_lit,
)
from .hashing import md5_long, minhash_token_hash  # noqa: F401
from .text import tokens, distinct_tokens, char_shingles  # noqa: F401
