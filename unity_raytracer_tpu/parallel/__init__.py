"""Multi-chip parallelism: device meshes, shard_map renderers, collectives."""
