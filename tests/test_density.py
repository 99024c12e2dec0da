"""Core DSL contract tests: conditioning, routing, fixed-value injection.

Mirrors the reference's strongest tests (``binf/tests/pdf/__init__.py``):
a mock 2-variable density log p = -0.5 * A * (x^2 + y^2) with A = 2, the
analytic values -13.0 / -29.0, chained conditionals reaching zero free
variables -- re-expressed against the functional Density API.
"""

import jax
import jax.numpy as jnp
import pytest

from binf_tpu.core import Density, ValueDict, VariableSpec, pytree_dataclass, static_field


@pytree_dataclass
class MockDensity(Density):
    """log p = -0.5 * A * (x^2 + y^2); reference mock with ParamA=2.0."""

    param_a: jax.Array
    fixed: ValueDict
    name: str = static_field(default="mock")

    @classmethod
    def create(cls, a=2.0):
        return cls(param_a=jnp.asarray(a, jnp.float32), fixed={})

    @property
    def variable_specs(self):
        return (VariableSpec("x"), VariableSpec("y"))

    def _log_prob(self, values):
        return -0.5 * self.param_a * (values["x"] ** 2 + values["y"] ** 2)


def test_log_prob_analytic():
    # reference: pdf.log_prob(x=3, y=2) == -13.0
    pdf = MockDensity.create()
    assert pdf.log_prob(x=3.0, y=2.0) == -13.0


def test_variables_sorted():
    pdf = MockDensity.create()
    assert pdf.variables == ("x", "y")
    assert pdf.differentiable_variables == ("x", "y")


def test_fix_variables():
    # reference testFix_variables: fixing y leaves only x free
    pdf = MockDensity.create().fix(y=5.0)
    assert pdf.variables == ("x",)
    assert float(pdf.fixed["y"]) == 5.0
    with pytest.raises(ValueError):
        pdf.fix(z=2.0)


def test_conditional_factory_chain():
    # reference testConditional_factory: -29.0 through chained conditioning
    pdf = MockDensity.create()
    cond = pdf.conditional_factory(x=5.0)
    assert cond.variables == ("y",)
    assert cond.log_prob(y=2.0) == -29.0

    cond2 = cond.conditional_factory(y=2.0)
    assert cond2.variables == ()
    assert cond2.log_prob() == -29.0


def test_set_fixed_from():
    # reference testSet_fixed_variables_from_pdf
    pdf1 = MockDensity.create().fix(y=2.0)
    pdf2 = MockDensity.create().set_fixed_from(pdf1)
    assert float(pdf2.fixed["y"]) == 2.0


def test_complete_values_injection():
    # reference testComplete_variables: fixed values are injected
    pdf = MockDensity.create().fix(x=7.0)
    complete = pdf._complete_values({"y": jnp.asarray(2.34)})
    assert float(complete["x"]) == 7.0
    assert float(complete["y"]) == pytest.approx(2.34)


def test_value_dict_strictness():
    pdf = MockDensity.create()
    with pytest.raises(ValueError):
        pdf.log_prob(x=1.0)  # missing y
    with pytest.raises(ValueError):
        pdf.log_prob(x=1.0, y=1.0, z=1.0)  # unexpected


def test_gradient_autodiff():
    pdf = MockDensity.create()
    g = pdf.gradient(x=3.0, y=2.0)
    assert float(g["x"]) == pytest.approx(-6.0)  # -A*x
    assert float(g["y"]) == pytest.approx(-4.0)


def test_gradient_of_conditional():
    cond = MockDensity.create().fix(x=5.0)
    g = cond.gradient(y=2.0)
    assert set(g) == {"y"}
    assert float(g["y"]) == pytest.approx(-4.0)


def test_update_fixed_no_structure_change():
    cond = MockDensity.create().fix(x=5.0)
    cond2 = cond.update_fixed(x=1.0)
    s1 = jax.tree.structure(cond)
    s2 = jax.tree.structure(cond2)
    assert s1 == s2  # same compiled-kernel cache entry
    assert cond2.log_prob(y=0.0) == -1.0


def test_density_is_jittable_pytree():
    pdf = MockDensity.create()

    @jax.jit
    def f(p: MockDensity, x, y):
        return p.log_prob(x=x, y=y)

    assert f(pdf, 3.0, 2.0) == -13.0
    # conditioned density jits too, with fixed values traced
    cond = pdf.fix(y=2.0)

    @jax.jit
    def g(p, x):
        return p.log_prob(x=x)

    assert g(cond, 3.0) == -13.0
    # updating the fixed VALUE reuses the same trace (no error, right result)
    assert g(cond.update_fixed(y=0.0), 3.0) == -9.0


def test_vmap_over_values():
    pdf = MockDensity.create()
    xs = jnp.arange(4.0)
    lps = jax.vmap(lambda x: pdf.log_prob(x=x, y=0.0))(xs)
    assert lps.shape == (4,)
    assert jnp.allclose(lps, -0.5 * 2.0 * xs**2)
