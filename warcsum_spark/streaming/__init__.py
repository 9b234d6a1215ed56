"""Structured Streaming lift of the stateless digest stage (SURVEY §2.9)."""
