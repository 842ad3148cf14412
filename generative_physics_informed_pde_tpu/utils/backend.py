"""Backend/platform resolution helpers.

``jax.default_backend()`` reports the process-level default and is NOT
affected by a ``jax.default_device(...)`` context -- so code that picks a
TPU-vs-CPU strategy at build time (multigrid preconditioner dtype, FFT vs
matmul-DFT sampling, on-device vs host data generation) would choose the
TPU path even while the caller has pinned computation to the host CPU
(e.g. bench.py's same-math CPU baseline).  ``effective_platform`` honours
the active default_device override first.
"""

from __future__ import annotations

import jax


def effective_platform() -> str:
    """Platform new uncommitted arrays will land on: the platform of the
    active ``jax.default_device`` override if one is set, else the
    process default backend ('tpu' | 'cpu' | 'gpu')."""
    dev = jax.config.jax_default_device
    if dev is not None:
        # jax accepts both a Device and a platform string for
        # default_device; a str override has no .platform attribute
        if isinstance(dev, str):
            return dev
        return dev.platform
    return jax.default_backend()
