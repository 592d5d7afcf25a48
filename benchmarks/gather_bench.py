"""CompGCN aggregation-floor microbenchmark (round-4 verdict item 8).

The encoder's hot cost is 8 gather/scatter mega-fusions at ~4x the
pure-stream rate (docs/PERF_ANALYSIS.md §4).  The aggregation decomposes
into gather(x[src]) -> msg -> sorted segment-sum; segsum already only ties
XLA (kernels/segsum.py header), so the gather primitive is the only lever
left for a blocked Pallas kernel.  This benchmark pins the primitive at the
exact encoder shapes (N=40,943 nodes x H=200 f32 = 800 B rows, E=173,670
edge gathers):

  stream       contiguous read+write of the same bytes  (HBM speed of light)
  xla_gather   y = x[idx]                       (what the encoder fusions do)
  xla_g+vjp    gather forward + scatter-add backward (the training pattern)
  pallas_dma   kernels/gather.py: per-row async DMAs, 16 in flight

If pallas_dma cannot beat xla_gather here, no aggregation kernel composed
from it can reach the >1.5x keep bar.  Run on the real chip:
    python -m benchmarks.gather_bench
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from complexhyperbolickge_tpu.kernels.gather import pallas_row_gather

N, H, E = 40943, 200, 173670
CHUNK = 512


def bench(name, fn, *args, n=30, bytes_moved=None):
    out = fn(*args)
    # fence by downloading a DEVICE-computed scalar slice: device programs
    # execute in dispatch order, so fetching out[0,0] completes the whole
    # chain, while np.asarray(out) would drag the full (E,H) buffer
    # (139 MB) through the tunnel and time the LINK, not the chip
    _ = float(out.reshape(-1)[0])
    trials = []
    for _i in range(3):
        t0 = time.perf_counter()
        for _j in range(n):
            out = fn(*args)
        _ = float(out.reshape(-1)[0])  # host fence on the chain
        trials.append((time.perf_counter() - t0) / n)
    dt = float(np.median(trials))
    gbps = (bytes_moved / dt / 1e9) if bytes_moved else float("nan")
    print(f"{name:12s} {dt * 1e3:7.3f} ms  {gbps:7.1f} GB/s "
          f"(trials {', '.join(f'{t * 1e3:.3f}' for t in trials)})")
    return dt


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    ep = (E + CHUNK - 1) // CHUNK * CHUNK
    idx = jnp.asarray(rng.integers(0, N, ep).astype(np.int32))
    xe = jnp.asarray(rng.normal(size=(ep, H)).astype(np.float32))

    row_bytes = H * 4
    moved = ep * row_bytes * 2  # read + write

    stream = jax.jit(lambda a: a * 2.0)
    xg = jax.jit(lambda a, i: a[i])

    def gather_loss(a, i):
        return jnp.sum(a[i] * 2.0)

    gvjp = jax.jit(jax.grad(gather_loss))

    t_stream = bench("stream", stream, xe, bytes_moved=moved)
    t_xla = bench("xla_gather", xg, x, idx, bytes_moved=moved)
    # grad output is (N, H): fwd gather read + bwd scatter-add read/modify/write
    t_vjp = bench("xla_g+vjp", gvjp, x, idx,
                  bytes_moved=ep * row_bytes * 3 + N * H * 4)
    # the kernel's rows are DMA-tile-padded 200 -> 1024 floats (see
    # kernels/gather.py): charge the real padded traffic
    t_pal = bench("pallas_dma", lambda i, a: pallas_row_gather(i, a, chunk=CHUNK),
                  idx, x, bytes_moved=ep * 1024 * 4 * 2)

    # correctness of the kernel on-chip (not just interpret mode)
    want = np.asarray(x)[np.asarray(idx)]
    got = np.asarray(pallas_row_gather(idx, x, chunk=CHUNK))
    assert np.array_equal(want, got[:, :H]), "pallas gather mismatch"
    assert not got[:, H:].any(), "pad columns must be zero"
    print(f"pallas gather exact; xla_gather at {t_xla / t_stream:.2f}x stream, "
          f"pallas at {t_pal / t_xla:.2f}x xla "
          f"(<1 means the DMA kernel is faster)")


if __name__ == "__main__":
    main()
