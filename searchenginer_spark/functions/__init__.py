"""Scalar/vectorized functions: tokenizers, hashing, text stats, vectors."""
