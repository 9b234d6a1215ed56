"""Relational operators of the engine: digest manifest, collision
resolution, copy numbering, run statistics, dedup family, similarity."""
