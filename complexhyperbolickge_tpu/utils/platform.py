"""Backend detection.

The production TPU in some environments is reached through a tunnel backend
whose platform name is NOT "tpu" (its device_kind still is) — so neither
`platform == "tpu"` (misses the tunnel) nor `platform != "cpu"` (matches
CUDA/ROCm, where Pallas TPU kernels cannot lower and f64 works fine) is the
right gate for TPU-only code paths."""

from __future__ import annotations

import jax


def is_tpu_backend() -> bool:
    """True when the default device is a TPU (native or tunneled)."""
    d = jax.devices()[0]
    return (
        d.platform == "tpu"
        or "tpu" in getattr(d, "device_kind", "").lower()
    )
