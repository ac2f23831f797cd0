"""State: lineage records, resumable partitioned output, metrics."""
