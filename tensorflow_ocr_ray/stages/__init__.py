"""Ray Data actor-pool stages (stateful map_batches callables)."""
