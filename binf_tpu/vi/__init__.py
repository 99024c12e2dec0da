from binf_tpu.vi.advi import (
    ADVIResult,
    FullRankParams,
    MeanFieldParams,
    advi,
    variational_sample,
)

__all__ = [
    "ADVIResult",
    "FullRankParams",
    "MeanFieldParams",
    "advi",
    "variational_sample",
]
