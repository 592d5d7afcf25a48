from complexhyperbolickge_tpu.models.gnn.models import (  # noqa: F401
    GNN_MODELS,
    CompGCN,
    GNNModel,
    LorentzGCN,
    PoincareGAT,
    PoincareGCN,
)
