from binf_tpu.smc.resampling import (
    effective_sample_size,
    multinomial_resample,
    stratified_resample,
    systematic_resample,
)
from binf_tpu.smc.smc import SMCResult, tempered_smc

__all__ = [
    "effective_sample_size",
    "multinomial_resample",
    "stratified_resample",
    "systematic_resample",
    "SMCResult",
    "tempered_smc",
]
