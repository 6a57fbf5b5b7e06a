"""Dataset -> Dataset stages: map_batches bodies, actor-pool classes,
and groupby compositions. Every stage is pure with respect to its input
Dataset and carries its schema contract in ``schemas.py``."""
