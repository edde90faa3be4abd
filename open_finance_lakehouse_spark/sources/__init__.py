"""Deterministic synthetic sources (the engine's fixture generators)."""
