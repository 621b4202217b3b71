"""Scalar function layer (text normalization, tokens, housenumbers, postcodes)."""
