"""Fused end-to-end pipelines."""
