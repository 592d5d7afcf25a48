"""complexhyperbolickge_tpu — a TPU-native complex-hyperbolic KG embedding framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
htmai-880/ComplexHyperbolicKGE (EMNLP 2022, arXiv 2211.03635): link prediction on
knowledge graphs with Euclidean / complex / real-hyperbolic / complex-hyperbolic
(FFT) / GNN-encoder embedding models.

Design stance (TPU-first, not a port):
  * pure-functional models: params are pytrees, score functions are pure and
    jit-compiled; the whole training epoch is a single XLA program (lax.scan).
  * all-entity scoring is expressed so the inner contraction is a matmul that
    lands on the MXU (the reference broadcasts (B,1,d)x(N,d) elementwise).
  * filtered ranking uses padded index arrays + vectorized scatter, replacing
    the reference's per-query Python loop (reference models/base.py:264-268).
  * multi-chip scaling via jax.sharding.Mesh + GSPMD shardings: batch on the
    'data' axis, entity table / score-matrix entity axis on 'model'.
"""

__version__ = "0.2.0"  # keep in sync with pyproject.toml

from complexhyperbolickge_tpu.models import all_models, get_model  # noqa: F401
