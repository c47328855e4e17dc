from .mesh import make_mesh, shard_batch, replicate_params, sparse_nmf_sharded

__all__ = ["make_mesh", "shard_batch", "replicate_params", "sparse_nmf_sharded"]
