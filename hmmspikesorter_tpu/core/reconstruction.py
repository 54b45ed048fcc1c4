"""Denoised signal reconstruction from a decoded state sequence.

Reference src/reconstruction.jl:1-10: Y[t] = sum_j mu[states[j, x_t], j] —
a single gather against the precomputed per-state means.
"""

from __future__ import annotations

import jax

from .emission import state_means


@jax.jit
def reconstruct_signal(x, states, mu):
    """(T,) reconstruction for decoded combined states x.

    x: (T,) int state indices; states: (n_neurons, S); mu: (K, n_neurons).
    """
    smu = state_means(states, mu)
    return smu[x]


@jax.jit
def unroll_mlseq(x, states):
    """(n_neurons, T) per-neuron ring positions for decoded states x
    (reference src/extraction.jl:4-13)."""
    return states[:, x]
