from binf_tpu.parallel.mesh import (
    CHAIN_AXIS,
    DATA_AXIS,
    HOST_AXIS,
    chain_sharding,
    make_chain_mesh,
    replicate,
    shard_chains,
)
from binf_tpu.parallel.collectives import (
    distributed_systematic_indices,
    pmean_over_chains,
    take_along_chain,
)
from binf_tpu.parallel.production import InferenceResult, run_blocks
from binf_tpu.parallel.runner import init_chains, run_chains, warmup_and_run

__all__ = [
    "CHAIN_AXIS",
    "DATA_AXIS",
    "HOST_AXIS",
    "chain_sharding",
    "make_chain_mesh",
    "replicate",
    "shard_chains",
    "init_chains",
    "run_chains",
    "warmup_and_run",
    "distributed_systematic_indices",
    "pmean_over_chains",
    "take_along_chain",
    "InferenceResult",
    "run_blocks",
]
