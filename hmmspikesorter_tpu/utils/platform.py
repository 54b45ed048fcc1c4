"""Backend detection for engine auto-selection.

The Pallas kernels lower through Mosaic and run only on TPU cores — but
the TPU backend may register under a plugin platform name (the tunneled
"axon" PJRT backend here), so `jax.default_backend() == "tpu"` is wrong
in both directions: it misses plugin TPUs and a plain `!= "cpu"` test
would select Mosaic kernels on a GPU backend where they cannot lower.
"""

from __future__ import annotations

import jax


def is_tpu_backend() -> bool:
    """True when the default JAX backend drives TPU cores (native `tpu`
    platform or a TPU plugin like `axon`, recognized by device kind)."""
    try:
        dev = jax.devices()[0]
    except Exception:
        return False
    name = (getattr(dev, "platform", "") or "").lower()
    kind = (getattr(dev, "device_kind", "") or "").lower()
    return "tpu" in name or "tpu" in kind
