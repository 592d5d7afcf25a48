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


def _stub_torch_scatter():
    """Faithful pure-torch stand-in for the two torch_scatter entry points
    the reference uses (scatter with reduce='sum'/'mean'/'max', scatter_add;
    messagepassing.py:5,34,86 / hyperbolicgnn convs) — enables EXECUTING the
    reference GNN convs for numeric parity (round-2 verdict item 4; the real
    torch_scatter binary is absent in this image).  Only installed when the
    real package is absent."""
    if "torch_scatter" in sys.modules:
        return
    if importlib.util.find_spec("torch_scatter") is not None:
        return
    import torch

    def scatter(src, index, dim=0, out=None, dim_size=None, reduce="sum"):
        assert dim == 0 and out is None, "reference only uses dim=0, out=None"
        index = index.long()
        if dim_size is None:
            dim_size = int(index.max().item()) + 1 if index.numel() else 0
        shape = (dim_size,) + tuple(src.shape[1:])
        if reduce in ("sum", "add"):
            return torch.zeros(shape, dtype=src.dtype).index_add_(0, index, src)
        if reduce == "mean":
            s = torch.zeros(shape, dtype=src.dtype).index_add_(0, index, src)
            ones = torch.ones(index.shape[0], dtype=src.dtype)
            cnt = torch.zeros(dim_size, dtype=src.dtype).index_add_(0, index, ones)
            return s / cnt.clamp(min=1).reshape(-1, *([1] * (src.dim() - 1)))
        if reduce == "max":
            out = torch.full(shape, float("-inf"), dtype=src.dtype)
            out.index_reduce_(0, index, src, "amax", include_self=True)
            out[out == float("-inf")] = 0
            return out
        raise ValueError(f"unsupported reduce {reduce!r}")

    def scatter_add(src, index, dim=0, out=None, dim_size=None):
        return scatter(src, index, dim=dim, out=out, dim_size=dim_size,
                       reduce="sum")

    mod = types.ModuleType("torch_scatter")
    mod.scatter = scatter
    mod.scatter_add = scatter_add
    sys.modules["torch_scatter"] = mod


def load(name: str):
    """Import e.g. 'utils.hyperbolic' or 'models.complexhyperbolic'."""
    _ensure_stub_packages()
    if name.startswith("datasets."):
        _stub_torch_geometric()
    if "gnn" in name or name in ("models.messagepassing", "models.mlp"):
        _stub_torch_scatter()
        _stub_torch_geometric()  # gnnbase imports datasets.kg_dataset
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
