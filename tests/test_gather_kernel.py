"""Pallas row-gather DMA kernel (kernels/gather.py) vs plain indexing.

Status: a measured STOP, kept as the evidence artifact for the CompGCN
aggregation ceiling (docs/PERF_ANALYSIS.md §4).  On-chip (2026-08-19) the
per-row-DMA form is 5.6x SLOWER than XLA's fused gather: Mosaic's DMA
granularity floor is one (8,128) tile = 4 KB, so 800 B encoder rows pad
5.1x, and XLA's gather primitive already runs at 0.83x stream rate.  The
kernel stays so the benchmark reruns on future toolchains; these tests pin
its correctness (interpret mode; real-chip exactness is asserted inside
benchmarks/gather_bench.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from complexhyperbolickge_tpu.kernels.gather import pallas_row_gather


@pytest.mark.parametrize("n,h,e,chunk", [
    (300, 200, 1024, 256),
    (97, 64, 512, 512),    # single grid step, non-multiple-of-8 table
    (16, 300, 128, 64),    # h not a lane multiple, heavy pad
])
def test_pallas_row_gather_matches_indexing(n, h, e, chunk):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    out = np.asarray(pallas_row_gather(idx, x, chunk=chunk, interpret=True))
    want = np.asarray(x)[np.asarray(idx)]
    assert np.array_equal(want, out[:, :h])
    assert not out[:, h:].any(), "pad columns must be zero"
