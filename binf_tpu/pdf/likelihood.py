"""Likelihood = error model composed with a forward model.

Functional analogue of the reference's ``Likelihood``
(``binf/pdf/likelihoods.py:12-175``): the likelihood inherits the union of
the forward model's variables and the error model's variables minus the
distinguished ``mock_data`` (reference ``:42-77``), routes incoming values
to the right submodel by name (reference ``_split_variables``, ``:122-139``),
and evaluates ``em.log_prob(mock_data=fwm(theta), ...)``
(reference ``:141-146``).

Gradients need no hand-coded chain rule (reference ``:148-155`` computes
``J_fwm . grad_em`` manually): ``jax.grad`` differentiates straight through
the composition.  Conditioning works through the flat ``fixed`` dict of the
base Density -- no parameter mirroring / ``bind_to`` machinery (reference
``:79-100``) is needed because values flow explicitly on every call.
"""

from __future__ import annotations

import jax

from typing import TYPE_CHECKING, Any

from binf_tpu.core.density import MOCK_DATA, Density, ValueDict, VariableSpec
from binf_tpu.core.modules import pytree_dataclass, static_field

if TYPE_CHECKING:  # avoid a circular import at runtime (model -> pdf -> model)
    from binf_tpu.model.error import ErrorModel
    from binf_tpu.model.forward import ForwardModel
else:
    ErrorModel = Any
    ForwardModel = Any

Array = jax.Array

__all__ = ["Likelihood"]


@pytree_dataclass
class Likelihood(Density):
    """p(data | variables) = error_model(mock_data=forward_model(vars), ...)."""

    forward_model: ForwardModel
    error_model: ErrorModel
    fixed: ValueDict
    name: str = static_field(default="likelihood")
    # Per-datum weight on the log-likelihood (SMC tempering / data annealing).
    temper: float | Array = 1.0

    @classmethod
    def create(cls, name: str, forward_model: ForwardModel, error_model: ErrorModel):
        return cls(
            forward_model=forward_model,
            error_model=error_model,
            fixed={},
            name=name,
        )

    # -- variable structure -------------------------------------------------

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:
        # union of submodel variables minus mock_data, minus anything already
        # conditioned inside the error model (the reference's fixed-variable
        # propagation, ``binf/pdf/likelihoods.py:42-77``)
        em_fixed = set(self.error_model.fixed)
        specs: dict[str, VariableSpec] = {}
        for s in self.forward_model.variable_specs:
            specs[s.name] = s
        for s in self.error_model.variable_specs:
            if s.name != MOCK_DATA and s.name not in specs and s.name not in em_fixed:
                specs[s.name] = s
        return tuple(specs.values())

    def _split_values(self, values: ValueDict) -> tuple[ValueDict, ValueDict]:
        """Route a complete value dict to (forward-model, error-model) parts.

        Mirrors reference ``_split_variables``
        (``binf/pdf/likelihoods.py:122-139``); a name known to both submodels
        is passed to both.
        """
        fwm_names = set(self.forward_model.variables)
        em_names = set(self.error_model.variables) - {MOCK_DATA}
        fwm_vals = {k: v for k, v in values.items() if k in fwm_names}
        em_vals = {k: v for k, v in values.items() if k in em_names}
        return fwm_vals, em_vals

    # -- evaluation ---------------------------------------------------------

    def _log_prob(self, values: ValueDict) -> Array:
        fwm_vals, em_vals = self._split_values(values)
        mock = self.forward_model._evaluate(fwm_vals)
        # honour any conditioning applied directly on the error model
        em_all = {**self.error_model.fixed, **em_vals, MOCK_DATA: mock}
        return self.temper * self.error_model._log_prob(em_all)
