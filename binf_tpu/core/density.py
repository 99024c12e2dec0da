"""Core model DSL: densities over *named* variables, with conditioning.

This is the TPU-native re-conception of the reference framework's central
abstraction: ``AbstractBinfNamedCallable`` / ``AbstractBinfPDF`` (reference
``binf/__init__.py:16-226``, ``binf/pdf/__init__.py:19-160``).  There, a PDF
is a mutable object holding a registry of named variables which can be
dynamically *fixed* -- converted into bound parameters -- so that
``conditional_factory`` yields conditional PDFs for Gibbs sampling without
rewriting density code.

Here the same capability is purely functional:

* a :class:`Density` is an immutable pytree; its *free variables* are part
  of the static structure, its fixed values are traced array leaves;
* ``log_prob`` is a pure function ``dict[str, Array] -> scalar``;
* ``fix(**values)`` / ``conditional_factory(**values)`` returns a NEW density
  whose free-variable set shrinks (a structural change, so each Gibbs block
  conditioning pattern compiles exactly once) and whose fixed values are
  closed over as traced leaves (so per-sweep value updates never recompile);
* gradients come from ``jax.grad`` instead of hand-written Jacobians
  (reference ``binf/model/forwardmodels.py:23-33``).

All densities operate on dictionaries of named arrays ("value dicts"),
the pytree analogue of the reference's kwargs routing
(reference ``binf/pdf/posteriors.py:139-142``).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp

from binf_tpu.core.modules import pytree_dataclass, replace, static_field

Array = jax.Array
ValueDict = dict[str, Array]

__all__ = ["Density", "VariableSpec", "as_value_dict", "MOCK_DATA"]

# Distinguished variable name linking forward models to error models
# (reference ``binf/pdf/likelihoods.py:60-66`` excludes it from the
# likelihood's inherited variables).
MOCK_DATA = "mock_data"


@pytree_dataclass
class VariableSpec:
    """Static description of a named model variable.

    Mirrors what the reference registers per variable
    (``binf/__init__.py:40-61``: a name plus a differentiability flag and a
    parameter type); shapes/dtypes are carried for state initialization.
    """

    name: str = static_field()
    shape: tuple[int, ...] = static_field(default=())
    dtype: Any = static_field(default=jnp.float32)
    differentiable: bool = static_field(default=True)


def as_value_dict(values: Mapping[str, Any] | None = None, **kw: Any) -> ValueDict:
    """Normalize (mapping, kwargs) into a dict of jnp arrays."""
    out: ValueDict = {}
    if values:
        out.update(values)
    out.update(kw)
    return {k: jnp.asarray(v) for k, v in out.items()}


class Density:
    """Base class for all densities (priors, likelihoods, posteriors).

    Concrete subclasses are ``pytree_dataclass``es declaring:

    * ``variable_specs`` (static): tuple of :class:`VariableSpec` naming every
      *original* variable of the density;
    * ``fixed`` (data): dict of currently conditioned-on values;
    * ``_log_prob(self, values)``: the density math over ALL original
      variables.

    The reference equivalents of the public surface:

    * ``log_prob``            <- ``AbstractBinfPDF.log_prob`` (``binf/pdf/__init__.py:91-104``)
    * ``gradient``            <- ``AbstractBinfPDF.gradient`` (``:106-111``)
    * ``fix``                 <- ``fix_variables`` (``:113-130``)
    * ``conditional_factory`` <- ``conditional_factory`` (``:49-70``)
    * ``variables``           <- ``AbstractBinfNamedCallable.variables`` (``binf/__init__.py:77-86``)
    """

    # -- static structure ---------------------------------------------------

    @property
    def variable_specs(self) -> tuple[VariableSpec, ...]:  # pragma: no cover
        raise NotImplementedError

    @property
    def variable_names(self) -> tuple[str, ...]:
        """All original variables, fixed or not (sorted)."""
        return tuple(sorted(s.name for s in self.variable_specs))

    @property
    def variables(self) -> tuple[str, ...]:
        """Currently *free* (un-fixed) variables, sorted by name."""
        fixed = self.fixed
        return tuple(v for v in self.variable_names if v not in fixed)

    @property
    def differentiable_variables(self) -> tuple[str, ...]:
        diff = {s.name for s in self.variable_specs if s.differentiable}
        return tuple(v for v in self.variables if v in diff)

    def spec(self, name: str) -> VariableSpec:
        for s in self.variable_specs:
            if s.name == name:
                return s
        raise KeyError(name)

    # -- values -------------------------------------------------------------
    # NOTE: concrete subclasses MUST declare a ``fixed: ValueDict`` data
    # field.  (No base-class property here: dataclasses would treat it as a
    # field default.)

    def _complete_values(self, values: ValueDict) -> ValueDict:
        """Merge fixed values into the provided free-variable values.

        Equivalent of ``_complete_variables`` injecting bound-parameter
        values (reference ``binf/pdf/__init__.py:153-160``).
        """
        free = set(self.variables)
        given = set(values)
        if given != free:
            missing = free - given
            extra = given - free
            raise ValueError(
                f"{type(self).__name__}: value dict must cover exactly the free "
                f"variables {sorted(free)}; missing={sorted(missing)}, "
                f"unexpected={sorted(extra)}"
            )
        return {**self.fixed, **values}

    # -- evaluation ---------------------------------------------------------

    def _log_prob(self, values: ValueDict) -> Array:  # pragma: no cover
        """Density math over a COMPLETE value dict (all original variables)."""
        raise NotImplementedError

    def log_prob(self, values: Mapping[str, Any] | None = None, **kw: Any) -> Array:
        """Log density at the given free-variable values."""
        vals = as_value_dict(values, **kw)
        return self._log_prob(self._complete_values(vals))

    def __call__(self, values: Mapping[str, Any] | None = None, **kw: Any) -> Array:
        """Probability density (exp of log_prob), as in the reference's
        ``_evaluate`` (``binf/pdf/__init__.py:87-89``)."""
        return jnp.exp(self.log_prob(values, **kw))

    def gradient(
        self, values: Mapping[str, Any] | None = None, **kw: Any
    ) -> ValueDict:
        """Gradient of log_prob w.r.t. the differentiable free variables.

        Returns a dict of arrays keyed by variable name (the pytree analogue
        of the reference's flat gradient vector,
        ``binf/pdf/posteriors.py:173-187``).  Computed with ``jax.grad`` --
        no hand-written Jacobians.
        """
        vals = as_value_dict(values, **kw)
        diff_names = [v for v in self.differentiable_variables if v in vals]
        rest = {k: v for k, v in vals.items() if k not in diff_names}

        def f(dv: ValueDict) -> Array:
            return self.log_prob({**rest, **dv})

        return jax.grad(f)({k: vals[k] for k in diff_names})

    def value_and_gradient(
        self, values: Mapping[str, Any] | None = None, **kw: Any
    ) -> tuple[Array, ValueDict]:
        vals = as_value_dict(values, **kw)
        diff_names = [v for v in self.differentiable_variables if v in vals]
        rest = {k: v for k, v in vals.items() if k not in diff_names}

        def f(dv: ValueDict) -> Array:
            return self.log_prob({**rest, **dv})

        return jax.value_and_grad(f)({k: vals[k] for k in diff_names})

    # -- conditioning -------------------------------------------------------

    def fix(self, values: Mapping[str, Any] | None = None, **kw: Any) -> "Density":
        """Condition on the given variables, returning a NEW density.

        Functional analogue of ``fix_variables``
        (reference ``binf/pdf/__init__.py:113-130``): the named variables
        leave the free set and their values are stored as traced leaves.
        """
        vals = as_value_dict(values, **kw)
        unknown = set(vals) - set(self.variables)
        if unknown:
            raise ValueError(
                f"{type(self).__name__}: cannot fix non-free variable(s) "
                f"{sorted(unknown)}; free variables are {list(self.variables)}"
            )
        return replace(self, fixed={**self.fixed, **vals})

    # Reference-compatible alias (``binf/pdf/__init__.py:49-70``).
    def conditional_factory(
        self, values: Mapping[str, Any] | None = None, **kw: Any
    ) -> "Density":
        return self.fix(values, **kw)

    def update_fixed(self, values: Mapping[str, Any] | None = None, **kw: Any) -> "Density":
        """Replace the VALUES of already-fixed variables (no structure change).

        This is the pure analogue of the reference Gibbs sampler mutating
        bound conditional-PDF parameters in place each sweep
        (``binf/samplers/gibbs.py:54-62``) -- same pytree structure, new
        leaves, hence no recompilation under jit.
        """
        vals = as_value_dict(values, **kw)
        unknown = set(vals) - set(self.fixed)
        if unknown:
            raise ValueError(f"not fixed: {sorted(unknown)}")
        return replace(self, fixed={**self.fixed, **vals})

    def set_fixed_from(self, other: "Density") -> "Density":
        """Copy the other's fixed values for variables this density knows.

        Analogue of ``set_fixed_variables_from_pdf``
        (reference ``binf/pdf/__init__.py:142-151``).
        """
        known = set(self.variables)
        take = {k: v for k, v in other.fixed.items() if k in known}
        return self.fix(take)

    # -- misc ---------------------------------------------------------------

    def init_values(self, key: Array | None = None) -> ValueDict:
        """Zero-initialized value dict for the free variables (shape/dtype
        from the variable specs); used for state initialization and
        compile-time shape probing."""
        out = {}
        for name in self.variables:
            s = self.spec(name)
            out[name] = jnp.zeros(s.shape, s.dtype)
        return out
