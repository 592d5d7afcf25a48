"""Pallas TPU kernels.

Production kernels (re-exported below): the fused filtered-ranking tile
kernels in ``chyp_rank.py`` / ``hyp_rank.py``.

Research / negative-result kernels (NOT production code, kept as documented
measured-negative results with tests; see docs/PERF_ANALYSIS.md):
``gather.py`` (per-row-DMA gather, 5.6x slower than XLA — Mosaic's 4 KB DMA
granularity floor), ``segsum.py`` (sorted segment-sum, ties XLA), and
``chyp_train.py`` (fused train scorer + VJP, perf-neutral vs XLA, behind a
module flag).  None are reachable from the default train/eval paths.
"""

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
