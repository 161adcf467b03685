"""Ray Data stage implementations (map_batches bodies, actor-pool
classes, groupby compositions)."""
