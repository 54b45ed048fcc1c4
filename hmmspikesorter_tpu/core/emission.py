"""Emission model: additive template superposition + Gaussian noise.

Reference: per-state means `_mu[i] = sum_j mu[states[j,i], j]`
(src/baumwelch.jl:30-37, src/viterbi.jl:66-72) and Gaussian log-pdf
emission (src/utils.jl:3-4).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.logmath import HALF_LOG_2PI


def state_means(states, mu):
    """(nstates,) per-state signal mean.

    states: (n_neurons, nstates) int — ring position per neuron (0 = silent).
    mu: (K, n_neurons) templates. Row 0 is the "silent" sample: the reference
    does NOT force it to zero at decode time (src/viterbi.jl:59 indexes
    mu[states[j,i], j] as given), so neither do we.
    """
    n = states.shape[0]
    return jnp.sum(mu[states, jnp.arange(n)[:, None]], axis=0)


def emission_logprob(y, state_mu, sigma):
    """(..., nstates) Gaussian emission log-probabilities for samples y.

    y: (...,) observations; broadcasts against state_mu (nstates,).
    """
    sigma = jnp.asarray(sigma, dtype=state_mu.dtype)
    log_sigma = jnp.log(sigma)
    d = y[..., None] - state_mu
    return -HALF_LOG_2PI - log_sigma - d * d / (2.0 * sigma * sigma)
