"""Model registry.

Mirrors the reference registry (models/__init__.py:9), plus PoincareGAT
(present-but-unregistered in the reference, poincaregnn.py:551): 25 names =
EUC + HYP + COMPLEX + CHYP + HYP_GNN + EUC_GNN.  The GNN encoder models
(PoincareGCN, LorentzGCN, CompGCN) take the KG graph structure in addition
to the config; see models/gnn/.
"""

from __future__ import annotations

from complexhyperbolickge_tpu.models.base import KGModel, ModelConfig  # noqa: F401
from complexhyperbolickge_tpu.models.chyperbolic import (  # noqa: F401
    CHYP_MODELS,
    FFTAttH,
    FFTIsoH,
    FFTRefH,
    FFTRotH,
)
from complexhyperbolickge_tpu.models.complexm import (  # noqa: F401
    COMPLEX_MODELS,
    BaseC,
    ComplEx,
    Fourier,
    RotatE,
)
from complexhyperbolickge_tpu.models.euclidean import (  # noqa: F401
    EUC_MODELS,
    AttE,
    CP,
    MurE,
    RefE,
    RotE,
    TransE,
)
from complexhyperbolickge_tpu.models.hyperbolic import (  # noqa: F401
    HYP_MODELS,
    AttH,
    AttRH,
    BaseH,
    HyboNet,
    IFFTH,
    IsoH,
    RefH,
    RotH,
    RotLH,
)

# GNN models are registered lazily (they need graph data at construction and
# live in a separate module); names kept in the registry for parity with the
# reference's all_models list.
GNN_MODELS = ["PoincareGCN", "PoincareGAT", "LorentzGCN", "CompGCN"]

all_models = EUC_MODELS + HYP_MODELS + COMPLEX_MODELS + CHYP_MODELS + GNN_MODELS

_REGISTRY = {
    name: obj
    for name, obj in list(globals().items())
    if isinstance(obj, type) and issubclass(obj, KGModel) and name in all_models
}


def get_model(name: str):
    """Resolve a model class by registry name."""
    if name in GNN_MODELS:
        from complexhyperbolickge_tpu.models import gnn  # lazy: heavier module

        return getattr(gnn, name)
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(f"unknown model {name!r}; available: {sorted(all_models)}")
