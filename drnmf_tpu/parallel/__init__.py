from .mesh import (make_mesh, make_mesh_2d, shard_batch, replicate_params,
                   fsdp_param_sharding, fsdp_shard_params,
                   sparse_nmf_sharded)
from .layerpipe import drnmf_scan_layer_pipelined
from .seqpipe import drnmf_scan_seq_pipelined
from .tensor_parallel import (drnmf_apply_tp_dp, drnmf_scan_tp,
                              drnmf_scan_tp_train)

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "shard_batch",
    "replicate_params",
    "fsdp_param_sharding",
    "fsdp_shard_params",
    "sparse_nmf_sharded",
    "drnmf_scan_layer_pipelined",
    "drnmf_scan_seq_pipelined",
    "drnmf_scan_tp",
    "drnmf_scan_tp_train",
    "drnmf_apply_tp_dp",
]
