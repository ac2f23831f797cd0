"""Sources: Parquet readers with pruning + the deterministic synthetic
transcript generator (tests/bench input — no external data)."""
