from .sharding import make_mesh, shard_centroid_batch, sharded_forward  # noqa: F401
