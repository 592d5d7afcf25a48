from complexhyperbolickge_tpu.kernels.chyp_rank import (  # noqa: F401
    chyp_rank_counts,
    make_pallas_ranker,
)
from complexhyperbolickge_tpu.kernels.hyp_rank import (  # noqa: F401
    attrh_rank_counts,
    hyp_rank_counts,
    make_pallas_attrh_ranker,
    make_pallas_hyp_ranker,
)
