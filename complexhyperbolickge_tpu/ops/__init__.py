"""Stateless manifold math ops (JAX).

Split by manifold, mirroring the reference's utils/ layer:
  math.py         — artanh / tanh / arcosh with the reference's exact clamps
  euclidean.py    — Givens rotations / reflections / unitary blocks, distances
  hyperbolic.py   — Poincare ball + Lorentz hyperboloid ops and distances
  chyperbolic.py  — complex-hyperbolic unit-ball ops and the Bergman distance
"""

from complexhyperbolickge_tpu.ops import chyperbolic, euclidean, hyperbolic, math  # noqa: F401
