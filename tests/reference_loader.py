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


def _stub_torch_geometric():
    """Register import-time stubs for torch_geometric so reference modules
    that merely IMPORT PyG symbols (datasets/kg_dataset.py:13-16 for the
    KGDataset3 path) can load; the stubbed symbols raise if actually used.
    Only installed when the real package is absent (it is, in this image)."""
    if "torch_geometric" in sys.modules:  # real package or our stub
        return
    if importlib.util.find_spec("torch_geometric") is not None:
        return

    def _missing(*a, **k):
        raise ModuleNotFoundError("torch_geometric is not available")

    specs = {
        "torch_geometric": {},
        "torch_geometric.data": {"Data": _missing},
        "torch_geometric.loader": {"LinkNeighborLoader": _missing},
        "torch_geometric.utils": {"select": _missing},
        "torch_geometric.utils.map": {"map_index": _missing},
        "torch_geometric.utils.num_nodes": {"maybe_num_nodes": _missing},
        "torch_geometric.utils.mask": {"index_to_mask": _missing},
        "torch_geometric.typing": {"OptTensor": None},
    }
    for name, attrs in specs.items():
        if name in sys.modules:
            continue
        mod = types.ModuleType(name)
        mod.__path__ = []  # mark as package so submodule imports resolve
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod


def load(name: str):
    """Import e.g. 'utils.hyperbolic' or 'models.complexhyperbolic'."""
    _ensure_stub_packages()
    if name.startswith("datasets."):
        _stub_torch_geometric()
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
