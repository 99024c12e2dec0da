from binf_tpu.ops.pallas.leapfrog import (
    quadratic_leapfrog,
    quadratic_leapfrog_reference,
)
from binf_tpu.ops.pallas.pairwise import (
    pairwise_restraint_loss,
    pairwise_restraint_loss_pallas,
    pairwise_restraint_loss_reference,
)

__all__ = [
    "quadratic_leapfrog",
    "quadratic_leapfrog_reference",
    "pairwise_restraint_loss",
    "pairwise_restraint_loss_pallas",
    "pairwise_restraint_loss_reference",
]
