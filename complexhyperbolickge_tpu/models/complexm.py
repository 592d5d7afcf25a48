"""Complex-space KG embedding models: ComplEx, RotatE, Fourier.

Reference: models/complex.py (COMPLEX_MODELS at :8).  `rank` is the real
storage width; the complex dimension is rank // 2 (complex.py:27-28).
"""

from __future__ import annotations

import jax.numpy as jnp

from complexhyperbolickge_tpu.models.base import KGModel, NoMask, dot_all, dot_train
from complexhyperbolickge_tpu.ops.fft import irfft_packed, rfft_packed
from complexhyperbolickge_tpu.ops.math import safe_sqrt

COMPLEX_MODELS = ["ComplEx", "RotatE", "Fourier"]


class BaseC(KGModel):
    """Hermitian dot-product scorer over packed [Re | Im] embeddings.

    sim(lhs, rhs) = sum Re(lhs) Re(rhs) + Im(lhs) Im(rhs)   (complex.py:30-37)
    which on the packed layout is a plain inner product — a single matmul in
    all-pairs mode.
    """

    def __init__(self, cfg):
        super().__init__(cfg)
        if cfg.rank % 2 != 0:  # user-config validation: must survive python -O
            raise ValueError(
                f"Complex models require even embedding dimension, got {cfg.rank}"
            )
        self.half = cfg.rank // 2

    def sim(self, lhs_pack, rhs_e, all_pairs: bool):
        (lhs_e,) = lhs_pack
        return dot_all(lhs_e, rhs_e) if all_pairs else dot_train(lhs_e, rhs_e)

    def _split(self, v):
        return v[..., : self.half], v[..., self.half :]

    def get_factors(self, params, queries, tails=None):
        """Complex magnitudes as regularization factors (complex.py:52-58).

        Quirk replicated: the reference's BaseC override IGNORES its `tails`
        argument — `get_complex_embeddings(queries)` is called without it
        (complex.py:54), so `rhs_e` falls back to the FULL entity table
        (complex.py:44-46) even in negative-sampling training, where every
        other family regularizes only the gold-tail rows
        (models/base.py:190-198).  The N3/F2 penalty for ComplEx / RotatE /
        Fourier therefore sums entity magnitudes over all N rows per step
        (still divided by the batch size, regularizers.py:30/58); matching
        it exactly is required for trajectory parity
        (tests/test_train_parity.py::test_complex_fulltable_factor_parity).
        """
        head_e = params["entity"][queries[..., 0]]
        rel_e = params["rel"][queries[..., 1]]
        del tails  # ignored by the reference's BaseC (complex.py:54)
        rhs_e = params["entity"]
        out = []
        for f, half in ((head_e, self.half), (rel_e, self._rel_half()), (rhs_e, self.half)):
            re, im = f[..., :half], f[..., half:]
            # the full-table rhs factor sweeps the mesh-padded zero rows
            # (parallel/mesh.py::pad_entity_tree): plain sqrt has NaN
            # gradient at exactly 0, which NaN'd the whole reg gradient
            out.append(safe_sqrt(re**2 + im**2))
        # the full-table factor is NOT a batch: NoMask keeps padded-batch
        # weights off it even when n_entities == batch_size (regularizers'
        # _masked_sum keys on the leading dim alone)
        return out[0], out[1], NoMask(out[2])

    def _rel_half(self):
        return self.half

    def _finish(self, params, queries, lhs_e):
        return (lhs_e,), params["bh"][queries[..., 0]]


class ComplEx(BaseC):
    """Complex bilinear product (complex.py:61-76)."""

    def get_queries(self, params, queries):
        hr, hi = self._split(params["entity"][queries[..., 0]])
        rr, ri = self._split(params["rel"][queries[..., 1]])
        lhs_e = jnp.concatenate([hr * rr - hi * ri, hr * ri + hi * rr], axis=-1)
        return self._finish(params, queries, lhs_e)


class RotatE(BaseC):
    """Unit-modulus complex rotations (complex.py:79-97)."""

    def get_queries(self, params, queries):
        hr, hi = self._split(params["entity"][queries[..., 0]])
        rr, ri = self._split(params["rel"][queries[..., 1]])
        rel_norm = jnp.sqrt(rr**2 + ri**2)
        cos, sin = rr / rel_norm, ri / rel_norm
        lhs_e = jnp.concatenate([hr * cos - hi * sin, hr * sin + hi * cos], axis=-1)
        return self._finish(params, queries, lhs_e)


class Fourier(BaseC):
    """irfft -> per-coordinate high/low-pass min/max -> rfft (complex.py:100-144).

    Note the reference's asymmetric FFT lengths: irfft with n = dim but rfft
    with n = 2*half - 1 (complex.py:131,137), reproduced exactly.
    """

    def __init__(self, cfg):
        super().__init__(cfg)
        self.dim = 2 * (self.half - 1)

    @property
    def rel_dim(self):
        return 2 * (self.cfg.rank // 2 - 1) * 2  # 2 * dim

    def _rel_half(self):
        return self.dim

    def init_post(self, params):
        # complex.py:108-111: shift the high-pass up and the low-pass down
        rel = params["rel"]
        shift = 3 * self.cfg.init_size
        rel = rel.at[..., : self.dim].add(shift)
        rel = rel.at[..., self.dim :].add(-shift)
        return {**params, "rel": rel}

    def get_queries(self, params, queries):
        head = params["entity"][queries[..., 0]]  # packed (B, 2*half)
        rel = params["rel"][queries[..., 1]]
        hpf, lpf = rel[..., : self.dim], rel[..., self.dim :]
        x = irfft_packed(head, n=self.dim)
        res = 0.5 * (jnp.minimum(x, hpf) + jnp.maximum(x, lpf))
        lhs_e = rfft_packed(res, n=2 * self.half - 1)
        return self._finish(params, queries, lhs_e)
