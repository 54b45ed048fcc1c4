"""Viterbi MAP decoding as a `jax.lax.scan` over a static in-edge gather table.

Reference semantics (src/viterbi.jl:44-98), reproduced deliberately:

* init is emission-only (the reference writes pi then immediately overwrites
  it, viterbi.jl:56-61) with a forced silent start ``T1[0,0] = 0``
  (viterbi.jl:63);
* the max-plus step keeps the *first* maximal in-edge in edge-list order
  (strict ``>``, viterbi.jl:74-84) — our in-edge rows are sorted by source
  state ascending and ``jnp.argmax`` returns the first maximum, so
  tie-breaking matches bit-for-bit;
* when no in-edge is finite the backpointer stays at state 0 (the reference
  initializes ``T2`` to state 1, viterbi.jl:53);
* the returned ``ll`` is ``sum_{t=1..T-1} T1[x_t, t]`` — the reference's
  cumulative-score sum (viterbi.jl:92-96), *not* the path log-likelihood.
  We reproduce it for parity.

TPU-first design: the per-step update is a fixed-shape gather
``v[in_idx] + in_w`` followed by an argmax over the (small, padded) in-degree
axis — O(S*D) fully vectorized VPU work per sample, no data-dependent shapes,
one compile per topology.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.logmath import HALF_LOG_2PI


def viterbi_decode(y, in_idx, in_w, state_mu, sigma, *, silent_start=True):
    """Decode one sequence.

    Args:
      y: (T,) observations.
      in_idx: (S, D) int32 in-edge source states (sorted ascending, padded 0).
      in_w: (S, D) in-edge log-probs (padded -inf).
      state_mu: (S,) per-state means.
      sigma: scalar noise std.
      silent_start: force T1[0,0]=0 (reference viterbi.jl:63). The chunked
        decoder uses this for every chunk.

    Returns:
      x: (T,) int32 decoded state sequence.
      ll: scalar, the reference's cumulative-score sum (viterbi.jl:92-96).
    """
    dtype = state_mu.dtype
    y = y.astype(dtype)
    sigma = jnp.asarray(sigma, dtype)
    log_sigma = jnp.log(sigma)
    inv_2s2 = 1.0 / (2.0 * sigma * sigma)
    S = state_mu.shape[0]

    def emission(v):
        d = v - state_mu
        return -HALF_LOG_2PI - log_sigma - d * d * inv_2s2

    v0 = emission(y[0])
    if silent_start:
        v0 = v0.at[0].set(jnp.asarray(0.0, dtype))

    def step(carry, yt):
        cand = carry[in_idx] + in_w                     # (S, D)
        best = jnp.argmax(cand, axis=1)                 # first max: ref tie-break
        mx = jnp.take_along_axis(cand, best[:, None], axis=1)[:, 0]
        bp = jnp.take_along_axis(in_idx, best[:, None], axis=1)[:, 0]
        bp = jnp.where(jnp.isfinite(mx), bp, 0).astype(jnp.int32)
        score = mx + emission(yt)
        return score, (bp, score)

    vT, (bps, scores) = jax.lax.scan(step, v0, y[1:])
    # bps/scores have leading axis T-1 (steps t = 1..T-1)
    xT = jnp.argmax(vT).astype(jnp.int32)

    def back(x_next, inp):
        bp_t, score_t = inp
        x_prev = bp_t[x_next]
        ll_inc = score_t[x_next]
        return x_prev, (x_prev, ll_inc)

    _, (xs, ll_incs) = jax.lax.scan(back, xT, (bps, scores), reverse=True)
    # With reverse=True outputs are stacked in forward order: xs[t] = x_t for
    # t = 0..T-2; the last state is xT.
    x = jnp.concatenate([xs, xT[None]])
    ll = jnp.sum(ll_incs)
    return x, ll


def viterbi_decode_batched(y, in_idx, in_w, state_mu, sigma, *, silent_start=True):
    """vmap over a leading batch axis of y: (B, T) -> (B, T), (B,)."""
    fn = lambda yy: viterbi_decode(yy, in_idx, in_w, state_mu, sigma,
                                   silent_start=silent_start)
    return jax.vmap(fn)(y)


def viterbi_decode_em(em, in_idx, in_w, *, silent_start=True):
    """Decode from precomputed per-state emissions — same dynamics, tie
    break, and ll definition as viterbi_decode, with the Gaussian emission
    replaced by an arbitrary (T, S) log-probability table. This is the
    generic path for emission models the scalar (y - mean)^2 form cannot
    express (e.g. the multi-channel model, core/emission_mc.py), and the
    correctness anchor for the structured MC ring engines.
    """
    dtype = em.dtype
    v0 = em[0]
    if silent_start:
        v0 = v0.at[0].set(jnp.asarray(0.0, dtype))

    def step(carry, em_t):
        cand = carry[in_idx] + in_w
        best = jnp.argmax(cand, axis=1)
        mx = jnp.take_along_axis(cand, best[:, None], axis=1)[:, 0]
        bp = jnp.take_along_axis(in_idx, best[:, None], axis=1)[:, 0]
        bp = jnp.where(jnp.isfinite(mx), bp, 0).astype(jnp.int32)
        score = mx + em_t
        return score, (bp, score)

    vT, (bps, scores) = jax.lax.scan(step, v0, em[1:])
    xT = jnp.argmax(vT).astype(jnp.int32)

    def back(x_next, inp):
        bp_t, score_t = inp
        x_prev = bp_t[x_next]
        return x_prev, (x_prev, score_t[x_next])

    _, (xs, ll_incs) = jax.lax.scan(back, xT, (bps, scores), reverse=True)
    x = jnp.concatenate([xs, xT[None]])
    return x, jnp.sum(ll_incs)
