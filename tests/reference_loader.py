"""Import reference modules for parity testing WITHOUT executing
reference/models/__init__.py (which hard-requires torch_geometric,
reference models/__init__.py:5-7 — verified ImportError, SURVEY §2.4).

We register stub packages for `models`/`utils`/`datasets`/`optimizers` with
__path__ pointing into /root/reference so submodule imports work, then import
the submodules we need directly.  Reference code is executed, never copied.
"""

from __future__ import annotations

import importlib
import sys
import types

REF = "/root/reference"

_PACKAGES = ("models", "utils", "datasets", "optimizers")


def _ensure_stub_packages():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for pkg in _PACKAGES:
        if pkg not in sys.modules:
            mod = types.ModuleType(pkg)
            mod.__path__ = [f"{REF}/{pkg}"]
            sys.modules[pkg] = mod


def load(name: str):
    """Import e.g. 'utils.hyperbolic' or 'models.complexhyperbolic'."""
    _ensure_stub_packages()
    return importlib.import_module(name)


def make_args(**kw):
    """Minimal argparse-like namespace for reference model constructors."""
    import argparse

    defaults = dict(
        rank=10,
        dropout=0.0,
        gamma=0.0,
        dtype="double",
        bias="learn",
        init_size=1e-3,
        multi_c=True,
    )
    defaults.update(kw)
    return argparse.Namespace(**defaults)
