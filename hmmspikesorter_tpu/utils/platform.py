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


def tpu_vmem_ceiling_bytes() -> int:
    """Scoped-VMEM ceiling to request from Mosaic on this backend.

    The 18 MB MC-decode live set and the N=4 K=60 pair grids were
    validated against a raised 64 MB ceiling on v5e; older cores with
    ~16 MB physical VMEM must keep Mosaic's conservative default so the
    engine gates fall back to the XLA engines instead of auto-selecting
    a kernel that fails scoped allocation at compile.
    """
    try:
        kind = (getattr(jax.devices()[0], "device_kind", "") or "").lower()
    except Exception:
        kind = ""
    if any(t in kind for t in ("v5", "v6", "v4")):
        return 64 * 2**20
    return 16 * 2**20
