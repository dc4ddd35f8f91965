from .sharding import make_mesh, make_sharder, shard_cache, shard_qtensor, shard_weights

__all__ = ["make_mesh", "make_sharder", "shard_cache", "shard_qtensor", "shard_weights"]
