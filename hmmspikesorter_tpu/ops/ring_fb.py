"""Ring-structured forward/backward (non-overlap space): gather-free EM scans.

Log-plus mirror of ops/ring_viterbi.py — the transition structure is
per-neuron {stay-silent, onset, ring shift, ring exit}, so each recursion
step is slices + logaddexp on (N, K-1) tensors instead of an in-edge gather
(which XLA lowers to slow scalar loops on TPU). Output layout is the flat
state indexing of core/state_space.py ([silent | body ravel]), so the EM
statistic reductions (train/em.py) consume it unchanged.

Semantics: reference src/baumwelch.jl:25-51 (dead-pi emission-only init)
and :73-98 (beta[T-1] = 0); bit-compatible with the gather engine up to
logsumexp reassociation (~1e-12, tested).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.logmath import HALF_LOG_2PI


def _consts(y, lp, mu, sigma):
    dtype = mu.dtype
    y = y.astype(dtype)
    K, N = mu.shape
    lp = jnp.asarray(lp, dtype)
    lpz = jnp.log1p(-jnp.exp(jnp.sum(lp)))
    sigma = jnp.asarray(sigma, dtype)
    log_sigma = jnp.log(sigma)
    inv_2s2 = 1.0 / (2.0 * sigma * sigma)
    silent_mean = jnp.sum(mu[0])
    body_mean = mu[1:].T + (silent_mean - mu[0])[:, None]   # (N, K-1)

    def em(v):
        ds = v - silent_mean
        db = v - body_mean
        return (-HALF_LOG_2PI - log_sigma - ds * ds * inv_2s2,
                -HALF_LOG_2PI - log_sigma - db * db * inv_2s2)

    return y, lp, lpz, em, K, N


def _lse(a, b):
    return jnp.logaddexp(a, b)


@jax.jit
def ring_forward(y, lp, mu, sigma):
    """(T, S) forward log-scores, flat state layout."""
    y, lp, lpz, em, K, N = _consts(y, lp, mu, sigma)
    dtype = y.dtype
    onset_w = lp + (N - 1) * lpz
    self_w = N * lpz
    stay_w = (N - 1) * lpz
    swap_w = (N - 2) * lpz          # ring exit of m + same-step onset of n
    diag_mask = jnp.where(jnp.eye(N, dtype=bool), -jnp.inf, 0.0).astype(dtype)

    es0, eb0 = em(y[0])

    def step(carry, y_t):
        vs, vb = carry
        es, ebm = em(y_t)
        ends = vb[:, -1]
        new_vs = _lse(vs + self_w, jax.nn.logsumexp(ends + stay_w)) + es
        # onset slot (n,1): from silent, or from any other ring exit
        swap = jax.nn.logsumexp(ends[:, None] + diag_mask, axis=0) + swap_w
        first = _lse(vs + onset_w, swap + lp)
        new_vb = jnp.concatenate(
            [first[:, None], vb[:, :-1] + stay_w], axis=1) + ebm
        flat = jnp.concatenate([new_vs[None], new_vb.reshape(-1)])
        return (new_vs, new_vb), flat

    _, rest = jax.lax.scan(step, (es0, eb0), y[1:])
    first = jnp.concatenate([es0[None], eb0.reshape(-1)])
    return jnp.concatenate([first[None], rest], axis=0)


@jax.jit
def ring_backward(y, lp, mu, sigma):
    """(T, S) backward log-scores, flat state layout."""
    y, lp, lpz, em, K, N = _consts(y, lp, mu, sigma)
    dtype = y.dtype
    onset_w = lp + (N - 1) * lpz
    self_w = N * lpz
    stay_w = (N - 1) * lpz
    swap_w = (N - 2) * lpz
    diag_mask = jnp.where(jnp.eye(N, dtype=bool), -jnp.inf, 0.0).astype(dtype)

    bs = jnp.asarray(0.0, dtype)
    bb = jnp.zeros((N, K - 1), dtype)

    def step(carry, y_next):
        bs, bb = carry
        es, ebm = em(y_next)           # emissions at t+1
        # silent out-edges: self + N onsets
        onset_terms = bb[:, 0] + ebm[:, 0] + onset_w        # (N,)
        new_bs = _lse(bs + es + self_w, jax.nn.logsumexp(onset_terms))
        # body: ring shift for k < K-1; ring exit at K-1 goes to silent OR
        # hands off to another neuron's same-step onset
        shifted = bb[:, 1:] + ebm[:, 1:] + stay_w           # (N, K-2)
        handoff = bb[:, 0] + ebm[:, 0] + lp                 # (N,) target terms
        exit_each = jax.nn.logsumexp(
            handoff[None, :] + diag_mask, axis=1) + swap_w  # (N,) per exiter
        exit_term = _lse(jnp.full(N, bs + es + stay_w, dtype), exit_each)
        new_bb = jnp.concatenate([shifted, exit_term[:, None]], axis=1)
        flat = jnp.concatenate([new_bs[None], new_bb.reshape(-1)])
        return (new_bs, new_bb), flat

    _, rest = jax.lax.scan(step, (bs, bb), y[1:], reverse=True)
    last = jnp.concatenate([bs[None], bb.reshape(-1)])
    return jnp.concatenate([rest, last[None]], axis=0)


@partial(jax.jit, static_argnames=())
def ring_emission(y, mu, sigma):
    """(T, S) emission log-probs in the flat layout (for EM statistics)."""
    y2, lp_d, lpz, em, K, N = _consts(y, jnp.zeros(mu.shape[1]), mu, sigma)
    es, ebm = jax.vmap(em)(y2)
    return jnp.concatenate([es[:, None], ebm.reshape(len(y2), -1)], axis=1)
