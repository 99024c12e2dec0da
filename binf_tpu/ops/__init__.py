from binf_tpu.ops.math import (
    log_sum_exp,
    polyval,
    safe_exp,
    safe_log,
    vandermonde,
    welford_init,
    welford_mean,
    welford_update,
    welford_variance,
)

__all__ = [
    "log_sum_exp",
    "polyval",
    "safe_exp",
    "safe_log",
    "vandermonde",
    "welford_init",
    "welford_mean",
    "welford_update",
    "welford_variance",
]
