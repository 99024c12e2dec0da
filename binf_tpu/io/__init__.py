from binf_tpu.io.cache import enable_persistent_cache
from binf_tpu.io.checkpoint import load_checkpoint, load_npz, save_checkpoint, save_npz
from binf_tpu.io.config import AdaptationConfig, KernelConfig, MeshConfig, RunConfig
from binf_tpu.io.metrics import MetricsLogger, aggregate_info, named_scope, trace

__all__ = [
    "enable_persistent_cache",
    "load_checkpoint",
    "load_npz",
    "save_checkpoint",
    "save_npz",
    "AdaptationConfig",
    "KernelConfig",
    "MeshConfig",
    "RunConfig",
    "MetricsLogger",
    "aggregate_info",
    "named_scope",
    "trace",
]
