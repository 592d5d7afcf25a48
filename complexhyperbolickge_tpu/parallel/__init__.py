from complexhyperbolickge_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    pad_entity_tree,
    padded_rows,
    param_shardings,
    shard_epoch_arrays,
    shard_params,
    unpad_entity_tree,
)
from complexhyperbolickge_tpu.parallel.ranking import (  # noqa: F401
    make_best_sharded_ranker,
    make_sharded_attrh_ranker,
    make_sharded_gnn_ranker,
    make_sharded_hyp_ranker,
    make_sharded_pallas_ranker,
    make_sharded_ranker,
)
