"""Log-domain math helpers (reference: src/utils.jl:1-47)."""

from __future__ import annotations

import math

import jax.numpy as jnp

# The reference's `log2pi` constant is actually 0.5*log(2*pi)
# (reference src/utils.jl:1) — we keep the value, not the misleading name.
HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


def gaussian_logpdf(x, mu, sigma, log_sigma=None):
    """`funcl` — reference src/utils.jl:3-4. Broadcasts over x/mu."""
    if log_sigma is None:
        log_sigma = jnp.log(sigma)
    d = x - mu
    return -HALF_LOG_2PI - log_sigma - d * d / (2.0 * sigma * sigma)


def logsumexp_rows(v, axis=-1):
    """Stable logsumexp that maps all -inf rows to -inf (no NaNs).

    The padded gather tables use -inf weights for missing edges, so rows can
    be entirely -inf; `jax.nn.logsumexp` handles this but we keep an explicit
    implementation to control the reduction order and dtype.
    """
    m = jnp.max(v, axis=axis, keepdims=True)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jnp.sum(jnp.exp(v - m_safe), axis=axis, keepdims=True)
    out = m_safe + jnp.log(s)
    out = jnp.where(jnp.isfinite(m), out, -jnp.inf)
    return jnp.squeeze(out, axis=axis)
