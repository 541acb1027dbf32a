"""Ray Data stages: map_batches callables + actor classes."""
