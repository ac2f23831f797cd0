"""Ray Data stages: ``map_batches`` callables built on the pure core."""
