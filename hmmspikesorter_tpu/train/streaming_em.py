"""Linear-memory (streaming) Baum-Welch: EM statistics without T x S tensors.

The reference materializes full (S, T) alpha and beta matrices
(src/baumwelch.jl:28,79) — the memory hot spot that bounds T in RAM
(SURVEY.md §5.7). This module computes the exact same EM update
(train/em.py semantics) in O(B*S + L*S) memory:

* pass 1 — forward scan over B blocks of L samples, keeping only the
  (B, S) block-boundary alpha vectors (classic checkpointing);
* pass 2 — reverse scan over blocks carrying the running beta vector and
  the EM sufficient statistics: each block recomputes its interior alpha
  (from its checkpoint) and beta (from the carry), folds its partial
  moments (linear `sum`s for mu/sigma, running logsumexp for the
  transition statistics), and discards the interiors.

Everything is a single jitted program: scan-over-blocks with fixed block
shape, with the in-block recursions running on the gather-free ring step
functions (ops/ring_fb.py). Statistics match em_step to float-reassociation
tolerance (tested).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core.emission import emission_logprob, state_means
from ..utils.logmath import logsumexp_rows
from .em import EMTables, edge_weights_from_structure


def _lse_merge(acc, new):
    return jnp.logaddexp(acc, new)


@partial(jax.jit, static_argnames=("K", "L"))
def streaming_em_step(y, lp, mu, sigma, tables: EMTables, *, K: int,
                      L: int = 1024):
    """One EM iteration with O(T/L * S + L * S) live memory.

    y: (T,) with T a multiple of L. Returns (lp, pi, mu, sigma, ll) —
    the same update as train.em.em_step.
    """
    from ..ops.ring_fb import (_bwd_step, _emission_fns, _flat, _fwd_step,
                               _unflat, _weights)

    N = tables.states.shape[0]
    S = tables.states.shape[1]
    Km1 = K - 1
    dtype = mu.dtype
    y = y.astype(dtype)
    T = y.shape[0]
    assert T % L == 0, "T must be a multiple of L"
    B = T // L

    onset_w = edge_weights_from_structure(
        lp, tables.onset_n_silent, tables.onset_onsets,
        jnp.ones_like(tables.onset_n_silent, dtype=bool))
    tgt = tables.onset_targets

    lp_d = jnp.asarray(lp, dtype)
    w = _weights(lp_d, dtype)
    em_fn = _emission_fns(jnp.asarray(mu, dtype), sigma)

    smu = state_means(tables.states, mu)
    y_blocks = y.reshape(B, L)
    # step alignment: global step s transitions into sample s; the dummy
    # step 0 (sample 0) applies the identity so blocks align with samples
    step_valid = (jnp.arange(T) > 0).reshape(B, L)

    def alpha_block(a_prev, y_blk, valid_blk):
        """Scan a block forward (ring step, gather-free); returns (L, S)
        alphas at its samples."""
        vs, vb = _unflat(a_prev, N, Km1)

        def stp(c, inp):
            cvs, cvb = c
            y_t, v = inp
            es, ebm = em_fn(y_t)
            nvs, nvb = _fwd_step(cvs, cvb, es, ebm, w)
            cvs = jnp.where(v, nvs, cvs)
            cvb = jnp.where(v, nvb, cvb)
            return (cvs, cvb), _flat(cvs, cvb)

        (vs, vb), alphas = jax.lax.scan(stp, (vs, vb), (y_blk, valid_blk))
        return _flat(vs, vb), alphas

    def beta_block(b_end, y_blk, valid_blk):
        """Reverse-scan a block; returns (L, S) betas at its samples.

        Carry enters as beta at the block's last sample; the scan computes
        beta at each step's source sample, so betas[l] = beta at sample
        l-1; shift left and append the entering carry.
        """
        bs, bb = _unflat(b_end, N, Km1)

        def stp(c, inp):
            cbs, cbb = c
            y_t, v = inp
            es, ebm = em_fn(y_t)
            nbs, nbb = _bwd_step(cbs, cbb, es, ebm, w)
            cbs = jnp.where(v, nbs, cbs)
            cbb = jnp.where(v, nbb, cbb)
            return (cbs, cbb), _flat(cbs, cbb)

        (bs, bb), betas_src = jax.lax.scan(stp, (bs, bb),
                                           (y_blk, valid_blk), reverse=True)
        betas = jnp.concatenate([betas_src[1:], b_end[None]], axis=0)
        return _flat(bs, bb), betas

    # ---- pass 1: boundary alphas (a0 = dead-pi emission-only init)
    em0 = emission_logprob(y[0], smu, sigma)

    def fwd(a, inp):
        y_blk, valid_blk = inp
        a_last, _ = alpha_block(a, y_blk, valid_blk)
        return a_last, a

    a_final, a_checkpoints = jax.lax.scan(fwd, em0, (y_blocks, step_valid))
    ll = logsumexp_rows(a_final, axis=-1)

    # ---- pass 2: reverse over blocks, accumulate statistics
    n_single = N * (K - 1)
    init = dict(
        beta=jnp.zeros(S, dtype),
        num=jnp.zeros(n_single, dtype),          # sum_t y_t gamma (single)
        den=jnp.zeros(n_single, dtype),
        G1=jnp.zeros(S, dtype),
        Gy=jnp.zeros(S, dtype),
        Gy2=jnp.zeros(S, dtype),
        xx=jnp.full(N + 1, -jnp.inf, dtype),     # lse_t xi (onset edges)
        bb=jnp.asarray(-jnp.inf, dtype),         # lse_t gamma[t, 0], t<T-1
        pi=jnp.zeros(S, dtype),
    )

    def bwd(carry, inp):
        y_blk, valid_blk, a_prev, is_first, is_last = inp
        em_blk = emission_logprob(y_blk, smu, sigma)   # for xi statistics
        _, alphas = alpha_block(a_prev, y_blk, valid_blk)
        b_first, betas = beta_block(carry["beta"], y_blk, valid_blk)

        ab = alphas + betas
        g = logsumexp_rows(ab, axis=1)
        log_gamma = ab - g[:, None]
        gamma = jnp.exp(log_gamma)

        # mu / sigma moments (linear sums)
        gw = gamma[:, 1 : 1 + n_single]
        num = carry["num"] + y_blk @ gw
        den = carry["den"] + jnp.sum(gw, axis=0)
        G1 = carry["G1"] + jnp.sum(gamma, axis=0)
        Gy = carry["Gy"] + y_blk @ gamma
        Gy2 = carry["Gy2"] + (y_blk * y_blk) @ gamma

        # transition statistics over this block's valid steps
        alpha_prev0 = jnp.concatenate([a_prev[0][None], alphas[:-1, 0]])
        xi = (alpha_prev0[:, None] + onset_w[None, :]
              + betas[:, tgt] + em_blk[:, tgt] - g[:, None])
        xi = jnp.where(valid_blk[:, None], xi, -jnp.inf)
        xx = _lse_merge(carry["xx"], logsumexp_rows(xi, axis=0))
        # bb excludes the global last sample
        last_mask = is_last & (jnp.arange(L) == L - 1)
        g0 = jnp.where(last_mask, -jnp.inf, log_gamma[:, 0])
        bb = _lse_merge(carry["bb"], logsumexp_rows(g0, axis=0))
        pi = jnp.where(is_first, log_gamma[0], carry["pi"])

        return dict(beta=b_first, num=num, den=den, G1=G1, Gy=Gy, Gy2=Gy2,
                    xx=xx, bb=bb, pi=pi), None

    flags_first = jnp.arange(B) == 0
    flags_last = jnp.arange(B) == B - 1
    out, _ = jax.lax.scan(
        bwd, init,
        (y_blocks, step_valid, a_checkpoints, flags_first, flags_last),
        reverse=True)

    new_lp = (out["xx"] - out["bb"])[1:]
    new_pi = out["pi"]
    from .em import occ_divide

    body = occ_divide(out["num"], out["den"]).reshape(N, K - 1).T
    new_mu = jnp.concatenate([jnp.zeros((1, N), dtype), body], axis=0)
    smu2 = state_means(tables.states, new_mu)
    x2 = (jnp.sum(out["Gy2"]) - 2.0 * jnp.dot(smu2, out["Gy"])
          + jnp.dot(smu2 * smu2, out["G1"]))
    new_sigma = jnp.sqrt(x2 / jnp.sum(out["G1"]))
    return new_lp, new_pi, new_mu, new_sigma, ll
