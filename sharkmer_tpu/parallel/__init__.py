"""Multi-device sharding: count table over a jax.sharding.Mesh."""

from .sharded_table import ShardedKmerTable, make_mesh  # noqa: F401
