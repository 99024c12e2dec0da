from binf_tpu.vi.pathfinder import (
    PathfinderResult,
    pathfinder,
    pathfinder_init,
)
from binf_tpu.vi.svgd import SVGDResult, svgd
from binf_tpu.vi.laplace import (
    LaplaceResult,
    inverse_mass_from_laplace,
    laplace_approximation,
    laplace_sample,
)
from binf_tpu.vi.advi import (
    ADVIResult,
    FullRankParams,
    MeanFieldParams,
    advi,
    variational_sample,
)

__all__ = [
    "PathfinderResult",
    "pathfinder",
    "pathfinder_init",
    "SVGDResult",
    "svgd",
    "LaplaceResult",
    "inverse_mass_from_laplace",
    "laplace_approximation",
    "laplace_sample",
    "ADVIResult",
    "FullRankParams",
    "MeanFieldParams",
    "advi",
    "variational_sample",
]
