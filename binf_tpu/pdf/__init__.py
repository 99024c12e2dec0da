from binf_tpu.pdf import distributions
from binf_tpu.pdf.likelihood import Likelihood
from binf_tpu.pdf.posterior import Posterior
from binf_tpu.pdf.priors import (
    ExponentialPrior,
    FunctionPrior,
    GammaPrior,
    GaussianPrior,
    HalfNormalPrior,
    Prior,
    UniformPrior,
)

__all__ = [
    "distributions",
    "Likelihood",
    "Posterior",
    "Prior",
    "GammaPrior",
    "GaussianPrior",
    "ExponentialPrior",
    "UniformPrior",
    "HalfNormalPrior",
    "FunctionPrior",
]
