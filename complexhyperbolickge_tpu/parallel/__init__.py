from complexhyperbolickge_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    param_shardings,
    shard_params,
    shard_epoch_arrays,
)
from complexhyperbolickge_tpu.parallel.ranking import make_sharded_ranker  # noqa: F401
