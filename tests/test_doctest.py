"""Run docstring examples across all ``gecco_tpu`` modules.

Mirrors the reference harness
(``/root/reference/tests/test_doctest.py:36-76``): walk every submodule,
collect doctests, execute them with ELLIPSIS — documentation examples
are part of the tested surface, not decoration.
"""

import doctest
import importlib
import pkgutil
import warnings

import pytest

import gecco_tpu


def _iter_modules():
    yield gecco_tpu
    for info in pkgutil.walk_packages(gecco_tpu.__path__, prefix="gecco_tpu."):
        try:
            yield importlib.import_module(info.name)
        except ImportError:
            # e.g. the compiled C++ core liborfscan.so is discovered as
            # a "module" but is a plain ctypes shared library
            continue


def _collect():
    finder = doctest.DocTestFinder(exclude_empty=True)
    cases = []
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for module in _iter_modules():
            for test in finder.find(module, module.__name__):
                if test.examples:
                    cases.append(test)
    return cases


_CASES = _collect()


def test_doctests_found():
    """The package keeps runnable examples (reference has them too)."""
    assert len(_CASES) >= 5


@pytest.mark.parametrize("case", _CASES, ids=lambda c: c.name)
def test_doctest(case):
    runner = doctest.DocTestRunner(
        optionflags=doctest.ELLIPSIS | doctest.NORMALIZE_WHITESPACE,
        verbose=False,
    )
    result = runner.run(case)
    assert result.failed == 0, f"{case.name}: {result.failed} doctest failure(s)"
