"""Time-parallel forward/backward via log-sum-exp block operators.

Same parallel-prefix structure as block_viterbi.py but over the (log, +)
semiring (cf. arXiv:2102.05743, PAPERS.md): per-block operators
F_b[i, j] = logsumexp over in-block paths i -> j (emissions included),
boundary alpha by prefix matvec, boundary beta by suffix matvec, then all
blocks recompute their interior alpha/beta in parallel. Exact up to float
reassociation (logsumexp regrouping) — validated against the sequential
scans at ~1e-12 on float64.

This is the machinery behind the time-sharded EM step (sharded_em.py): the
reference materializes full (S, T) alpha/beta on one host
(src/baumwelch.jl:28,79); here each device holds only its span.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.emission import emission_logprob
from ..utils.logmath import logsumexp_rows


def _lse_matvec_left(v, M):
    """out[j] = lse_i (v[i] + M[i, j])."""
    return logsumexp_rows(v[:, None] + M, axis=0)


def _lse_matvec_right(M, v):
    """out[i] = lse_j (M[i, j] + v[j])."""
    return logsumexp_rows(M + v[None, :], axis=1)


def _logplus_block_operator(em_block, mask_block, in_idx, in_w):
    """(S, S) log-plus operator for one block of transition steps; padded
    steps apply the identity."""
    S = em_block.shape[-1]
    eye = jnp.where(jnp.eye(S, dtype=bool), 0.0, -jnp.inf).astype(em_block.dtype)

    def step(V, inp):
        em_t, valid = inp
        contrib = V[:, in_idx] + in_w                  # (S, S, D)
        nxt = logsumexp_rows(contrib, axis=-1) + em_t[None, :]
        return jnp.where(valid, nxt, V), None

    M, _ = jax.lax.scan(step, eye, (em_block, mask_block))
    return M


def _block_alpha(alpha0, em_block, mask_block, in_idx, in_w):
    """(L, S) in-block forward vectors given the boundary vector alpha0
    (scores at the sample *before* the block's first step)."""

    def step(a, inp):
        em_t, valid = inp
        nxt = em_t + logsumexp_rows(a[in_idx] + in_w, axis=1)
        a = jnp.where(valid, nxt, a)
        return a, a

    _, alphas = jax.lax.scan(step, alpha0, (em_block, mask_block))
    return alphas


def _block_beta(beta_end, em_block, mask_block, out_idx, out_w):
    """(L, S) in-block backward vectors, beta at the *source* sample of each
    step, given beta at the block's last sample."""

    def step(b, inp):
        em_t, valid = inp
        nxt = logsumexp_rows((b + em_t)[out_idx] + out_w, axis=1)
        b = jnp.where(valid, nxt, b)
        return b, b

    _, betas = jax.lax.scan(step, beta_end, (em_block, mask_block),
                            reverse=True)
    return betas


def _pad_steps(em_steps, L):
    Tm1, S = em_steps.shape
    B = -(-Tm1 // L)
    pad = B * L - Tm1
    em_p = jnp.pad(em_steps, ((0, pad), (0, 0)))
    mask = jnp.arange(B * L) < Tm1
    return em_p.reshape(B, L, S), mask.reshape(B, L), B


@partial(jax.jit, static_argnames=("L",))
def blocked_forward_backward(y, in_idx, in_w, out_idx, out_w, state_mu,
                             sigma, *, L: int = 256):
    """(T, S) alpha and beta, computed block-parallel.

    Same contract as core.forward_backward.forward/backward (dead-pi
    emission-only init, beta[T-1] = 0), equal to them up to logsumexp
    reassociation.
    """
    dtype = state_mu.dtype
    y = y.astype(dtype)
    T = y.shape[0]
    em = emission_logprob(y, state_mu, sigma)
    a0 = em[0]

    em_blocks, mask, B = _pad_steps(em[1:], L)

    ops = jax.vmap(_logplus_block_operator, in_axes=(0, 0, None, None))(
        em_blocks, mask, in_idx, in_w)                  # (B, S, S)

    def fwd_chain(v, M):
        return _lse_matvec_left(v, M), v

    _, alpha0s = jax.lax.scan(fwd_chain, a0, ops)       # (B, S)

    bT = jnp.zeros_like(a0)

    def bwd_chain(v, M):
        return _lse_matvec_right(M, v), v

    _, betaEs = jax.lax.scan(bwd_chain, bT, ops, reverse=True)  # (B, S)

    alphas = jax.vmap(_block_alpha, in_axes=(0, 0, 0, None, None))(
        alpha0s, em_blocks, mask, in_idx, in_w)         # (B, L, S)
    betas = jax.vmap(_block_beta, in_axes=(0, 0, 0, None, None))(
        betaEs, em_blocks, mask, out_idx, out_w)        # (B, L, S)

    S = a0.shape[0]
    alpha = jnp.concatenate([a0[None], alphas.reshape(-1, S)[: T - 1]])
    # betas[b, l] is beta at the *source* sample of step l, i.e. sample index
    # (block offset + l); beta at the final sample is bT.
    beta = jnp.concatenate([betas.reshape(-1, S)[: T - 1], bT[None]])
    return alpha, beta
