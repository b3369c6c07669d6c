"""Operators: structural transforms, diff, dedup, similarity, as-of joins."""
