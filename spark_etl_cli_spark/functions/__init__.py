"""Column-level function libraries: text analysis, vector math."""
