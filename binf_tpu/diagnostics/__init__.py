from binf_tpu.diagnostics.model_comparison import (
    LOOResult,
    WAICResult,
    pointwise_log_likelihood,
    psis_loo,
    waic,
)
from binf_tpu.diagnostics.rhat import (
    ess,
    ess_bulk,
    ess_tail,
    rhat,
    split_rhat,
    summary,
)

__all__ = [
    "ess",
    "ess_bulk",
    "ess_tail",
    "rhat",
    "split_rhat",
    "summary",
    "LOOResult",
    "WAICResult",
    "pointwise_log_likelihood",
    "psis_loo",
    "waic",
]
