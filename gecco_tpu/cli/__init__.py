"""Command-line interface entry point (``gecco-tpu``).

Reference console-script: ``gecco = gecco.cli:main``
(``/root/reference/pyproject.toml:62-63``).
"""

from .commands import main

__all__ = ["main"]
