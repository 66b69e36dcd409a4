"""Scalar/vectorized functions: tokenization, string distance, text stats."""
