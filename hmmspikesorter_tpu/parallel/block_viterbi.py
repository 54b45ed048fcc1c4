"""Exact time-parallel Viterbi via max-plus block operators.

The sequential engine (core/viterbi.py) is a T-step `lax.scan` whose per-step
work is tiny (S x D gather) — latency-bound on TPU. This module trades FLOPs
for parallelism, the parallel-prefix formulation of Viterbi (cf. Särkkä &
García-Fernández 2021, arXiv:2102.05743, PAPERS.md):

1. Split the T-1 transition steps into B blocks of L. For each block compute
   the max-plus *operator* M_b[i, j] = best score over in-block paths from
   state i (at the sample before the block) to state j (at the block's last
   sample), including in-block emissions. All B operator scans run in
   parallel (vmap) — O(T * S^2 * D / B) depth, VPU-saturating width.
2. Chain boundary score vectors alpha_b by max-plus matvec through the B
   operators — a B-step scan over (S,) vectors (B << T).
3. Re-decode every block in parallel given its exact boundary vector,
   recording per-step scores and, for *every possible end state*, the
   in-block path (an L-step pointer-chase vectorized over all S end states).
4. Stitch: a B-step backward chain picks each block's end state from the
   next block's entry map; paths are then pure gathers.

The result is exactly the sequential Viterbi path (same per-step tie-break:
first maximal in-edge) up to float reassociation at block boundaries — the
boundary score is added to a block-sum rather than accumulated per step, so
scores can differ by ~1 ulp * L; label flips require near-exact score ties.
Decode parity is asserted in tests on float64.

Reference semantics preserved (src/viterbi.jl:44-98): emission-only init,
forced silent start, first-max tie-break, and the cumulative-score ll
(sum_t T1[x_t, t], viterbi.jl:92-96).

Scale note: operator memory is B*S^2 — right for non-overlap spaces
(S ~ 200); overlap spaces (S ~ 10^4) use `overlap_save` instead
(SURVEY.md §2b).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.emission import emission_logprob


def _pad_steps(em_steps, L):
    """Pad (T-1, S) emission steps to a multiple of L with a validity mask."""
    Tm1, S = em_steps.shape
    B = -(-Tm1 // L)
    pad = B * L - Tm1
    em_p = jnp.pad(em_steps, ((0, pad), (0, 0)))
    mask = jnp.arange(B * L) < Tm1
    return em_p.reshape(B, L, S), mask.reshape(B, L), B, pad


def _block_operator(em_block, mask_block, in_idx, in_w):
    """(S, S) max-plus operator for one block of L steps.

    Row-wise this runs the same update as the sequential engine, once per
    source state; masked (padded) steps apply the identity operator.
    """
    S = em_block.shape[-1]
    eye = jnp.where(jnp.eye(S, dtype=bool), 0.0, -jnp.inf).astype(em_block.dtype)

    def step(V, inp):
        em_t, valid = inp
        cand = V[:, in_idx] + in_w          # (S, S, D)
        nxt = jnp.max(cand, axis=-1) + em_t[None, :]
        return jnp.where(valid, nxt, V), None

    M, _ = jax.lax.scan(step, eye, (em_block, mask_block))
    return M


def _block_redecode(alpha0, em_block, mask_block, in_idx, in_w):
    """Re-decode one block given its exact boundary score vector.

    Returns (scores, paths, entry, final):
      scores: (L, S) per-step T1 scores (padded steps repeat the carry);
      paths:  (L, S) state at each in-block step for every possible block
              end state;
      entry:  (S,) state at the boundary sample (before the block) for every
              possible end state;
      final:  (S,) scores after the block.
    """
    S = alpha0.shape[0]

    def fwd(v, inp):
        em_t, valid = inp
        cand = v[in_idx] + in_w             # (S, D)
        best = jnp.argmax(cand, axis=1)     # first max: reference tie-break
        mx = jnp.take_along_axis(cand, best[:, None], axis=1)[:, 0]
        bp = jnp.take_along_axis(in_idx, best[:, None], axis=1)[:, 0]
        bp = jnp.where(jnp.isfinite(mx), bp, 0).astype(jnp.int32)
        score = mx + em_t
        v_next = jnp.where(valid, score, v)
        bp = jnp.where(valid, bp, jnp.arange(S, dtype=jnp.int32))
        return v_next, (bp, v_next)

    final, (bps, scores) = jax.lax.scan(fwd, alpha0, (em_block, mask_block))

    ends = jnp.arange(S, dtype=jnp.int32)

    def back(states, bp_t):
        prev = bp_t[states]
        return prev, states

    entry, paths = jax.lax.scan(back, ends, bps, reverse=True)
    return scores, paths, entry, final


@partial(jax.jit, static_argnames=("L",))
def blocked_viterbi(y, in_idx, in_w, state_mu, sigma, *, L: int = 256):
    """Exact parallel Viterbi decode of one sequence.

    Same contract as core.viterbi.viterbi_decode: returns (x, ll) with the
    reference's ll definition. L is the block length (tune so B = ceil(T/L)
    blocks saturate the VPU; B*S^2 operator memory).
    """
    dtype = state_mu.dtype
    y = y.astype(dtype)
    S = state_mu.shape[0]
    em = emission_logprob(y, state_mu, sigma)          # (T, S)
    v0 = em[0].at[0].set(jnp.asarray(0.0, dtype))      # forced silent start

    em_blocks, mask, B, pad = _pad_steps(em[1:], L)

    # Phase 1: all block operators in parallel.
    ops = jax.vmap(_block_operator, in_axes=(0, 0, None, None))(
        em_blocks, mask, in_idx, in_w)                 # (B, S, S)

    # Phase 2: boundary vectors by max-plus matvec chain (B steps).
    def matvec(v, M):
        nxt = jnp.max(v[:, None] + M, axis=0)
        return nxt, v

    _, alpha0s = jax.lax.scan(matvec, v0, ops)         # (B, S): pre-block vecs

    # Phase 3: parallel in-block re-decode.
    scores, paths, entries, finals = jax.vmap(
        _block_redecode, in_axes=(0, 0, 0, None, None))(
        alpha0s, em_blocks, mask, in_idx, in_w)
    # scores/paths: (B, L, S); entries/finals: (B, S)

    # Phase 4: stitch across blocks (B-step chain, tiny).
    x_end = jnp.argmax(finals[-1]).astype(jnp.int32)

    def chain(end, inp):
        entry_b = inp
        prev_end = entry_b[end]
        return prev_end, end

    x0, ends = jax.lax.scan(chain, x_end, entries, reverse=True)  # ends: (B,)

    # Gather labels: block b contributes paths[b, :, ends[b]].
    x_blk = jnp.take_along_axis(paths, ends[:, None, None], axis=2)[:, :, 0]
    x_steps = x_blk.reshape(-1)
    # reference ll: sum_t T1[x_t, t] over steps t=1..T-1 (viterbi.jl:92-96) —
    # gather each step's score at the *path* state.
    ll_steps = jnp.take_along_axis(
        scores, x_blk[:, :, None], axis=2)[:, :, 0].reshape(-1)
    valid = mask.reshape(-1)
    x = jnp.concatenate([x0[None], x_steps[: y.shape[0] - 1]])
    ll = jnp.sum(jnp.where(valid, ll_steps, 0.0))
    return x, ll
