"""Scalar column functions: digests, base32, URL canonicalization, text stats."""
