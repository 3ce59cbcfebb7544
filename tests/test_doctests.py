"""Doctest runner for the key API docstrings (the reference runs
--doctest-modules over all of torchcfm, pyproject.toml:2-7 — here the
executable examples live in the five modules a new user touches first)."""

import doctest
import importlib

import pytest

# importlib: cfm_tpu.ops re-exports the sinkhorn FUNCTION under the same
# name, so attribute access would shadow the module object.
MODULES = [
    importlib.import_module(name)
    for name in (
        "cfm_tpu.paths",
        "cfm_tpu.coupling",
        "cfm_tpu.integrate",
        "cfm_tpu.ops.sinkhorn",
    )
]


@pytest.mark.parametrize("mod", MODULES, ids=lambda m: m.__name__)
def test_module_doctests(mod):
    result = doctest.testmod(mod, verbose=False)
    assert result.failed == 0, f"{result.failed} doctest failures in {mod.__name__}"
    assert result.attempted > 0, f"no doctests collected from {mod.__name__}"
