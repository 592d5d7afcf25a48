"""Real-FFT helpers over the packed [Re | Im] layout, plus DFT-matrix forms.

The reference round-trips entity embeddings between complex frequency space
and real coordinate space with torch.fft.rfft/irfft(norm="ortho")
(models/complexhyperbolic.py:84,92).  Here:

  * `irfft_packed` / `rfft_packed` — XLA FFT HLOs via jnp.fft; used by default.
  * `irfft_matrix` / `rfft_matrix` — the same linear maps as explicit (small)
    real matrices.  For the paper's sizes (rank 33 -> dim 64) the transform is
    a 66x64 matmul, which the MXU executes faster than a length-64 FFT and
    which Pallas kernels can fuse with neighbouring work.  Matrices are built
    once per (rank, n) at trace time and are compile-time constants.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def _fft_dtype(dtype):
    """XLA's FFT HLO only accepts f32/f64; bf16 round-trips through f32."""
    return jnp.float64 if dtype == jnp.float64 else jnp.float32


def irfft_packed(v, n=None):
    """Packed (..., 2R) [Re | Im] -> real (..., n); n defaults to 2(R-1)."""
    r = v.shape[-1] // 2
    ft = _fft_dtype(v.dtype)
    zc = v[..., :r].astype(ft) + 1j * v[..., r:].astype(ft)
    if n is None:
        n = 2 * (r - 1)
    return jnp.fft.irfft(zc, n=n, norm="ortho").astype(v.dtype)


def rfft_packed(x, n=None):
    """Real (..., n) -> packed (..., 2*(n//2 + 1)) [Re | Im]."""
    z = jnp.fft.rfft(x.astype(_fft_dtype(x.dtype)), n=n, norm="ortho")
    return jnp.concatenate([z.real, z.imag], axis=-1).astype(x.dtype)


@lru_cache(maxsize=None)
def _irfft_matrix_np(r: int, n: int) -> np.ndarray:
    """(2R, n) real matrix M with packed_v @ M == irfft_packed(packed_v, n)."""
    eye = np.eye(r)
    out = np.zeros((2 * r, n))
    for j in range(r):
        out[j] = np.fft.irfft(eye[j], n=n, norm="ortho")
        out[r + j] = np.fft.irfft(1j * eye[j], n=n, norm="ortho")
    return out


@lru_cache(maxsize=None)
def _rfft_matrix_np(n: int, r_out: int) -> np.ndarray:
    """(n, 2*r_out) real matrix M with x @ M == rfft_packed(x) (n -> r_out bins)."""
    eye = np.eye(n)
    out = np.zeros((n, 2 * r_out))
    for j in range(n):
        z = np.fft.rfft(eye[j], n=n, norm="ortho")
        out[j, :r_out] = z.real
        out[j, r_out:] = z.imag
    return out


def irfft_matrix(r: int, n: int | None = None, dtype=jnp.float32):
    if n is None:
        n = 2 * (r - 1)
    return jnp.asarray(_irfft_matrix_np(r, n), dtype=dtype)


def rfft_matrix(n: int, dtype=jnp.float32):
    r_out = n // 2 + 1
    return jnp.asarray(_rfft_matrix_np(n, r_out), dtype=dtype)


def irfft_packed_mm(v, n=None):
    """Matmul form of irfft_packed — same math, lands on the MXU."""
    r = v.shape[-1] // 2
    if n is None:
        n = 2 * (r - 1)
    m = irfft_matrix(r, n, dtype=v.dtype)
    return jnp.matmul(v, m, preferred_element_type=v.dtype, precision="highest")


def rfft_packed_mm(x):
    """Matmul form of rfft_packed."""
    m = rfft_matrix(x.shape[-1], dtype=x.dtype)
    return jnp.matmul(x, m, preferred_element_type=x.dtype, precision="highest")
