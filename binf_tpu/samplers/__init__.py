from binf_tpu.samplers.auto import (
    RoutingDecision,
    adaptive_hmc,
    route_algorithm,
    route_trajectory_sampler,
)
from binf_tpu.samplers.chain_grid import chain_grid_model_hmc
from binf_tpu.samplers.adaptation import (
    DualAveragingState,
    dual_averaging_init,
    dual_averaging_step_size,
    dual_averaging_update,
    find_reasonable_step_size,
    window_adaptation,
)
from binf_tpu.samplers.base import (
    LogDensityFn,
    Position,
    SamplerKernel,
    make_logdensity,
    run_kernel,
    sample_chain,
)
from binf_tpu.samplers.chees import ChEESResult, chees_adaptation, chees_hmc
from binf_tpu.samplers.conjugate import gamma_precision_block, gaussian_linear_block
from binf_tpu.samplers.gibbs import (
    GibbsState,
    direct_block,
    gibbs,
    hmc_block,
    mala_block,
    mh_block,
    nuts_block,
)
from binf_tpu.samplers.dense import (
    DenseAdaptationResult,
    DenseHMCState,
    dense_hmc,
    dense_window_adaptation,
)
from binf_tpu.samplers.hmc import DenseMetric, HMCInfo, HMCState, hmc
from binf_tpu.samplers.mala import MALAInfo, MALAState, mala
from binf_tpu.samplers.nuts import NUTSInfo, NUTSState, nuts
from binf_tpu.samplers.quadratic_hmc import QuadraticHMCState, quadratic_hmc
from binf_tpu.samplers.rwm import RWMInfo, RWMState, rwm
from binf_tpu.samplers.slice import (
    EllipticalSliceInfo,
    EllipticalSliceState,
    SliceInfo,
    SliceState,
    elliptical_slice,
    slice_sampler,
)
from binf_tpu.samplers.tempering import PTInfo, PTState, geometric_betas, parallel_tempering

__all__ = [
    "RoutingDecision",
    "adaptive_hmc",
    "route_algorithm",
    "route_trajectory_sampler",
    "ChEESResult",
    "chain_grid_model_hmc",
    "chees_adaptation",
    "chees_hmc",
    "DualAveragingState",
    "dual_averaging_init",
    "dual_averaging_step_size",
    "dual_averaging_update",
    "find_reasonable_step_size",
    "window_adaptation",
    "LogDensityFn",
    "Position",
    "SamplerKernel",
    "make_logdensity",
    "run_kernel",
    "sample_chain",
    "gamma_precision_block",
    "gaussian_linear_block",
    "GibbsState",
    "direct_block",
    "gibbs",
    "hmc_block",
    "mala_block",
    "mh_block",
    "nuts_block",
    "HMCInfo",
    "HMCState",
    "hmc",
    "NUTSInfo",
    "NUTSState",
    "nuts",
    "QuadraticHMCState",
    "quadratic_hmc",
    "PTInfo",
    "PTState",
    "geometric_betas",
    "parallel_tempering",
    "MALAInfo",
    "MALAState",
    "mala",
    "RWMInfo",
    "RWMState",
    "rwm",
    "EllipticalSliceInfo",
    "EllipticalSliceState",
    "SliceInfo",
    "SliceState",
    "elliptical_slice",
    "slice_sampler",
    "DenseAdaptationResult",
    "DenseHMCState",
    "dense_hmc",
    "DenseMetric",
    "dense_window_adaptation",
]
