from binf_tpu.example.polynomial import (
    TRUE_COEFFICIENTS,
    TRUE_PRECISION,
    get_map,
    initial_positions,
    make_collapsed_gibbs_kernel,
    make_data,
    make_gibbs_kernel,
    make_likelihood,
    make_posterior,
    make_priors,
    predict,
)

__all__ = [
    "TRUE_COEFFICIENTS",
    "TRUE_PRECISION",
    "get_map",
    "initial_positions",
    "make_collapsed_gibbs_kernel",
    "make_data",
    "make_gibbs_kernel",
    "make_likelihood",
    "make_posterior",
    "make_priors",
    "predict",
]
