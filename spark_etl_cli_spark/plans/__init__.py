"""Named query library + DuckDB oracle SQL (driver correctness contract)."""
