"""Posterior: additive composition of likelihoods and priors.

Functional analogue of the reference's ``Posterior``
(``binf/pdf/posteriors.py:15-211``): log p(theta | D) = sum over component
log-probs, with each component receiving exactly its own variable subset
(reference ``_evaluate_components``, ``:125-145``).  Conditioning every
component at once (reference ``conditional_factory``, ``:201-210``) falls
out of the flat ``fixed`` dict: values are merged before routing.

The gradient is a dict-of-arrays pytree from ``jax.grad`` rather than the
reference's flat concatenated vector (``:173-187``), which makes
heterogeneous variable shapes (scalar precision + vector coefficients +
(N,3) structures) first-class.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from binf_tpu.core.density import Density, ValueDict, VariableSpec
from binf_tpu.core.modules import pytree_dataclass, static_field
Array = jax.Array

__all__ = ["Posterior"]


@pytree_dataclass
class Posterior(Density):
    """Un-normalized posterior over the union of component variables."""

    likelihoods: dict[str, Density]
    priors: dict[str, Density]
    fixed: ValueDict
    name: str = static_field(default="posterior")

    @classmethod
    def create(cls, likelihoods: dict[str, Density], priors: dict[str, Density],
               name: str = "posterior"):
        return cls(likelihoods=dict(likelihoods), priors=dict(priors), fixed={},
                   name=name)

    # -- components ---------------------------------------------------------

    @property
    def components(self) -> dict[str, Density]:
        return {**self.likelihoods, **self.priors}

    # -- variable structure -------------------------------------------------

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:
        specs: dict[str, VariableSpec] = {}
        for comp in self.components.values():
            for name in comp.variables:  # only the component's FREE variables
                if name not in specs:
                    specs[name] = comp.spec(name)
        return tuple(specs.values())

    @property
    def differentiable_variables(self) -> tuple[str, ...]:
        diff: set[str] = set()
        for comp in self.components.values():
            diff.update(comp.differentiable_variables)
        return tuple(v for v in self.variables if v in diff)

    # -- evaluation ---------------------------------------------------------

    def _component_values(self, comp: Density, values: ValueDict) -> ValueDict:
        """Restrict a complete posterior value dict to one component's free
        variables (reference kwargs routing, ``posteriors.py:139-142``)."""
        return {k: values[k] for k in comp.variables}

    def _log_prob(self, values: ValueDict) -> Array:
        total = jnp.zeros(())
        for comp in self.components.values():
            total = total + comp._log_prob(
                {**comp.fixed, **self._component_values(comp, values)}
            )
        return total

    def component_log_probs(self, values=None, **kw) -> dict[str, Array]:
        """Per-component log-probs (diagnostics / tempering)."""
        from binf_tpu.core.density import as_value_dict

        vals = self._complete_values(as_value_dict(values, **kw))
        return {
            name: comp._log_prob({**comp.fixed, **self._component_values(comp, vals)})
            for name, comp in self.components.items()
        }

    # -- tempering (used by SMC) --------------------------------------------

    def tempered(self, beta: float | Array) -> "Posterior":
        """Posterior with every likelihood raised to the power beta
        (prior left untouched) -- the standard SMC tempering path."""
        from binf_tpu.core.modules import replace

        new_liks = {}
        for name, lik in self.likelihoods.items():
            if hasattr(lik, "temper"):  # any likelihood-like density
                new_liks[name] = replace(lik, temper=beta)
            else:
                new_liks[name] = lik
        return replace(self, likelihoods=new_liks)

    def sample_prior(self, key: Array) -> ValueDict:
        """One joint draw from all prior components (SMC initialization).

        Only free variables covered by a prior with a sampler are drawn;
        raises if any free variable has no prior.
        """
        out: ValueDict = {}
        keys = jax.random.split(key, max(len(self.priors), 1))
        for k, prior in zip(keys, self.priors.values()):
            out.update(prior.sample(k))
        missing = set(self.variables) - set(out)
        if missing:
            raise ValueError(f"no prior sampler covers variable(s) {sorted(missing)}")
        return {k: v for k, v in out.items() if k in self.variables}

    def log_likelihood(self, values=None, **kw) -> Array:
        """Sum of likelihood components only (needed for SMC weights)."""
        from binf_tpu.core.density import as_value_dict

        vals = self._complete_values(as_value_dict(values, **kw))
        total = jnp.zeros(())
        for comp in self.likelihoods.values():
            total = total + comp._log_prob(
                {**comp.fixed, **self._component_values(comp, vals)}
            )
        return total
