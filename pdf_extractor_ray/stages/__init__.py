"""Ray Data stages: map_batches callables (stateless tasks + actor pools)."""
