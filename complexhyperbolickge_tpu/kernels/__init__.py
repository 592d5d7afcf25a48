from complexhyperbolickge_tpu.kernels.chyp_rank import (  # noqa: F401
    chyp_rank_counts,
    make_pallas_ranker,
)
