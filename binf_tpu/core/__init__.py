from binf_tpu.core.density import Density, ValueDict, VariableSpec, as_value_dict
from binf_tpu.core.modules import field, pytree_dataclass, replace, static_field

__all__ = [
    "Density",
    "ValueDict",
    "VariableSpec",
    "as_value_dict",
    "field",
    "pytree_dataclass",
    "replace",
    "static_field",
]
