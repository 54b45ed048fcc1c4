"""Multi-channel emission model: additive template superposition observed on
C channels with independent (diagonal-covariance) Gaussian noise.

This is a capability extension beyond the reference: the reference CLI
receives multi-channel templates (`spikeForms` is (K, nchan, N),
src/hmmsort.jl:46-56) but discards every channel except the first
(`waveforms[:,1,:]`). Here the decode uses all channels jointly — each
neuron has a per-channel template mu[k, n, c], the state mean is the
per-channel additive superposition (the C-channel generalization of
src/baumwelch.jl:30-37), and the emission is the sum of per-channel
Gaussian log-pdfs (src/utils.jl:3-4 per channel):

    e_s(t) = sum_c [ -log(sqrt(2 pi)) - log sigma_c
                     - (y[t,c] - m[s,c])^2 / (2 sigma_c^2) ].

TPU-first factorization (the design the ring engines consume): expand the
square and the state structure —

    e_s(t) = u(t) + <z_t, m_s> - b_s,      z[t,c] = y[t,c] / sigma_c^2,

with u(t) state-independent and b_s = sum_c m[s,c]^2 / (2 sigma_c^2)
static. Additive superposition makes <z_t, m_s> decompose per neuron:
with base(t) = <z_t, all-silent mean> and the neuron increment streams

    d[t, n, k] = <z_t, mu[k+1, n] - mu[0, n]>,

every state's projection is base(t) plus the d's of its active neurons.
Computing d is ONE (T, C) x (C, N*(K-1)) matmul — MXU work — after which
the combined-state Viterbi/FB dynamics are identical to the single-channel
ring engines; only the per-step emission reads change from inline
(y - mean)^2 to stream slices plus static energy tables. See
ops/ring_viterbi_mc.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logmath import HALF_LOG_2PI

# The projection matmuls feed score comparisons: keep them in true f32
# (the TPU default rounds f32 matmul operands to bf16, which flips labels
# near score ties — measured on the ovn selection matmuls).
_PREC = jax.lax.Precision.HIGHEST


def state_means_mc(states, mu):
    """(S, C) per-state per-channel means.

    states: (N, S) int ring position per neuron (0 = silent).
    mu: (K, N, C) per-channel templates. Row 0 is the silent sample per
    channel (kept as given, like the single-channel path — the reference
    does not zero it at decode time, src/viterbi.jl:59).
    """
    n = states.shape[0]
    return jnp.sum(mu[states, jnp.arange(n)[:, None]], axis=0)


def emission_logprob_mc(yc, state_mu_c, sigmas):
    """Dense (T, S) multi-channel emission log-probabilities.

    yc: (T, C) observations; state_mu_c: (S, C); sigmas: (C,) noise stds.
    Direct per-channel sum — the correctness anchor and the generic-engine
    path for small state spaces; the ring engines use the factorized
    streams from mc_streams instead.
    """
    dtype = state_mu_c.dtype
    yc = yc.astype(dtype)
    sigmas = jnp.asarray(sigmas, dtype)
    d = yc[:, None, :] - state_mu_c[None, :, :]          # (T, S, C)
    return jnp.sum(
        -HALF_LOG_2PI - jnp.log(sigmas) - d * d / (2.0 * sigmas * sigmas),
        axis=-1)


class MCTables:
    """Static per-topology constants of the factorized MC emission.

    Built host-side once per (mu, sigmas); consumed by the ring MC
    engines. All arrays are numpy (trace-time constants).

    Attributes:
      b_sil: scalar — silent-state energy sum_c m_sil_c^2 / (2 s_c^2).
      c1: (N, K-1) — single-active energy minus b_sil.
      x2: dict[(n, m)] -> (K-1, K-1) pair-emission correction table:
          e_pair = eb_n[k1] + eb_m[k2] - es + x2[(n, m)][k1, k2].
      u_const: scalar — the y-independent part of u(t).
      zscale: (C,) 1 / sigma_c^2.
      delta: (C, N*(K-1)) projection matrix for the d streams (n-major).
      silent_sum: (C,) all-silent mean per channel.
    """

    def __init__(self, mu, sigmas):
        mu = np.asarray(mu, np.float64)
        sigmas = np.asarray(sigmas, np.float64)
        K, N, C = mu.shape
        Km1 = K - 1
        inv2 = 1.0 / (2.0 * sigmas * sigmas)             # (C,)
        self.zscale = 1.0 / (sigmas * sigmas)
        self.silent_sum = mu[0].sum(axis=0)              # (C,)
        self.u_const = float(np.sum(-HALF_LOG_2PI - np.log(sigmas)))
        self.b_sil = float(np.sum(self.silent_sum ** 2 * inv2))

        # single-active mean: mu[k, n] + (silent_sum - mu[0, n])
        other = self.silent_sum[None, :] - mu[0]         # (N, C)
        sm = mu[1:].transpose(1, 0, 2) + other[:, None, :]   # (N, Km1, C)
        b1 = np.sum(sm * sm * inv2, axis=-1)             # (N, Km1)
        self.c1 = b1 - self.b_sil

        # neuron-increment projection: d[t, n, k] = <z_t, mu[k+1,n]-mu[0,n]>
        dmu = mu[1:] - mu[0][None, :, :]                 # (Km1, N, C)
        self.delta = dmu.transpose(2, 1, 0).reshape(C, N * Km1)

        # pair-energy corrections for every unordered pair (n < m):
        # pair mean = mu[k1,n] + mu[k2,m] + (silent_sum - mu[0,n] - mu[0,m]).
        # c2[(n, m)] is the direct pair energy offset (e_pair = es + d_n[k1]
        # + d_m[k2] - c2); x2 is the cross-term form the ov2 engine uses
        # (e_pair = eb_n[k1] + eb_m[k2] - es + x2).
        self.x2 = {}
        self.c2 = {}
        for n in range(N):
            for m in range(n + 1, N):
                rest = self.silent_sum[None, None, :] - mu[0, n] - mu[0, m]
                pm = (mu[1:, n][:, None, :] + mu[1:, m][None, :, :] + rest)
                b2 = np.sum(pm * pm * inv2, axis=-1)     # (Km1, Km1)
                c2 = b2 - self.b_sil
                self.c2[(n, m)] = c2
                self.x2[(n, m)] = (self.c1[n][:, None] + self.c1[m][None, :]
                                   - c2)
        self.K, self.N, self.C = K, N, C


def mc_streams(yc, tables: MCTables, dtype=None):
    """Factorized emission streams for the ring MC engines.

    yc: (T, C) observations (or (..., T, C): leading axes broadcast).

    Returns (es, d):
      es: (..., T) silent-state emission log-prob stream
          u(t) + base(t) - b_sil;
      d:  (..., T, N, K-1) neuron-increment streams, so the body-slot
          emission is eb[n, k] = es + d[n, k] - c1[n, k] and a pair slot is
          eb_n[k1] + eb_m[k2] - es + x2[(n, m)][k1, k2].
    """
    if dtype is None:
        dtype = jnp.asarray(yc).dtype
        if dtype not in (jnp.float32, jnp.float64):
            dtype = jnp.float32
    yc = jnp.asarray(yc, dtype)
    z = yc * jnp.asarray(tables.zscale, dtype)           # (..., T, C)
    base = z @ jnp.asarray(tables.silent_sum, dtype)     # (..., T)
    u = (jnp.asarray(tables.u_const, dtype)
         - 0.5 * jnp.sum(yc * z, axis=-1))
    es = u + base - jnp.asarray(tables.b_sil, dtype)
    d = jnp.matmul(z, jnp.asarray(tables.delta, dtype),
                   precision=_PREC)                      # (..., T, N*(K-1))
    Km1 = tables.K - 1
    d = d.reshape(*d.shape[:-1], tables.N, Km1)
    return es, d


class MCTablesDevice:
    """In-graph MCTables: the same constants (see MCTables for the
    algebra) computed with jnp, so mu/sigmas may be TRACERS — the
    drift-tracked decode and posterior evaluate each halo window under
    its own adapted templates inside one vmapped program
    (train/adaptive.py). Duck-types MCTables for mc_streams; the pair
    tables come pre-stacked i-major (`c2_stack` (P, Km1, Km1), the
    _pairs order; `x2_01` is the N == 2 cross form). K/N/C stay static
    Python ints (shape-derived)."""

    def __init__(self, mu, sigmas, dtype=None):
        mu = jnp.asarray(mu, dtype)
        sigmas = jnp.asarray(sigmas, mu.dtype)
        K, N, C = mu.shape
        inv2 = 1.0 / (2.0 * sigmas * sigmas)             # (C,)
        self.zscale = 1.0 / (sigmas * sigmas)
        self.silent_sum = mu[0].sum(axis=0)              # (C,)
        self.u_const = jnp.sum(-HALF_LOG_2PI - jnp.log(sigmas))
        self.b_sil = jnp.sum(self.silent_sum ** 2 * inv2)

        other = self.silent_sum[None, :] - mu[0]         # (N, C)
        sm = mu[1:].transpose(1, 0, 2) + other[:, None, :]   # (N, Km1, C)
        self.c1 = jnp.sum(sm * sm * inv2, axis=-1) - self.b_sil

        dmu = mu[1:] - mu[0][None, :, :]                 # (Km1, N, C)
        self.delta = dmu.transpose(2, 1, 0).reshape(C, N * (K - 1))

        c2s = []
        for n in range(N):
            for m in range(n + 1, N):
                rest = (self.silent_sum[None, None, :]
                        - mu[0, n] - mu[0, m])
                pm = (mu[1:, n][:, None, :] + mu[1:, m][None, :, :]
                      + rest)
                c2s.append(jnp.sum(pm * pm * inv2, axis=-1) - self.b_sil)
        self.c2_stack = jnp.stack(c2s) if c2s else None
        self.x2_01 = (self.c1[0][:, None] + self.c1[1][None, :]
                      - self.c2_stack[0]) if N == 2 else None
        self.K, self.N, self.C = K, N, C
