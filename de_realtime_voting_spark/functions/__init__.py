from .columns import (
    candidate_party,
    char_ngrams,
    cosine_similarity,
    dot_product,
    l2_norm,
    lsh_bucket,
    minhash_signature,
    simhash_band,
    simhash_hex,
    simhash_token_bands,
    tokens,
    word_shingles,
)

__all__ = [
    "candidate_party",
    "char_ngrams",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "lsh_bucket",
    "minhash_signature",
    "simhash_band",
    "simhash_hex",
    "simhash_token_bands",
    "tokens",
    "word_shingles",
]
