"""State posteriors and per-spike confidence from forward-backward.

Beyond-reference capability: the reference computes alpha/beta only as EM
internals (src/baumwelch.jl:25-98) and never exposes posterior quantities;
spike-sorting practice, however, wants a per-spike quality score (how much
posterior mass actually supports each decoded onset) next to the MAP
labels. This module provides

  * ``state_log_posteriors`` — the full (T, S) log gamma = alpha + beta -
    logZ (small recordings / tests);
  * ``onset_posteriors`` — the (T, N) marginal P(neuron n onsets at t),
    computed with a checkpointed two-pass block algorithm so the (T, S)
    gamma is never materialized: the forward pass stores one (S,) alpha
    checkpoint per block, the backward pass rematerializes each block's
    alphas from its checkpoint while streaming beta right-to-left, and
    the block's posterior mass is immediately projected onto the
    per-neuron onset indicator with one (block, S) x (S, N) matmul (MXU
    work; memory is O(block * S), not O(T * S));
  * ``onset_posteriors_windowed`` — the fast parallel mode: halo
    windows processed concurrently (the posterior mirror of the decode's
    overlap-save parallelization), per-t renormalized; mixing-limited
    accuracy (~exact for H of a few K on silence-dominated signals) and
    ~16x the exact two-pass on TPU;
  * ``onset_posteriors_tracked`` — the windowed mode under a drift track
    (train/adaptive.py): each window is evaluated with the chunk
    parameters that decoded its span;
  * ``spike_confidence`` — per decoded spike: the posterior onset mass in
    a +/-w window around the decoded onset (same-neuron onsets are >= K
    apart, so windows with w <= (K-1)//2 never overlap).

Forward/backward semantics mirror core/forward_backward.py exactly
(emission-only forward init — the reference's dead-pi quirk,
baumwelch.jl:31-36 — and beta[T-1] = 0): the blocked result is
bit-identical to the materialized one in the same dtype (tested).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logmath import logsumexp_rows
from .emission import emission_logprob, state_means


def onset_projection(states) -> np.ndarray:
    """(S, N) float indicator: state s has neuron n at ring phase 1 (the
    onset sample — the timestamp extract_spiketimes aligns)."""
    states = np.asarray(states)
    return (states == 1).T.astype(np.float64)


def state_log_posteriors(y, in_idx, in_w, out_idx, out_w, state_mu, sigma):
    """(T, S) log gamma — full materialization; prefer onset_posteriors
    for long recordings."""
    from .forward_backward import backward, forward

    alpha = forward(y, in_idx, in_w, state_mu, sigma)
    beta = backward(y, out_idx, out_w, state_mu, sigma)
    logz = logsumexp_rows(alpha[-1], axis=-1)
    return alpha + beta - logz


@partial(jax.jit, static_argnames=("first",))
def _alpha_block(a_entry, em_blk, in_idx, in_w, *, first: bool):
    """Alphas for one block. first=True: emission-only init at t=0."""
    def step(carry, em_t):
        a = em_t + logsumexp_rows(carry[in_idx] + in_w, axis=1)
        return a, a

    if first:
        a0 = em_blk[0]
        a_last, rest = jax.lax.scan(step, a0, em_blk[1:])
        return a_last, jnp.concatenate([a0[None], rest], axis=0)
    a_last, a_all = jax.lax.scan(step, a_entry, em_blk)
    return a_last, a_all


@jax.jit
def _beta_block(b_exit, em_next_blk, out_idx, out_w):
    """Betas for steps t whose next-emissions are em_next_blk (reverse
    scan); b_exit is beta at the step after the block."""
    def step(carry, em_next):
        contrib = (carry + em_next)[out_idx] + out_w
        b = logsumexp_rows(contrib, axis=1)
        return b, b

    b_first, b_all = jax.lax.scan(step, b_exit, em_next_blk, reverse=True)
    return b_first, b_all


@jax.jit
def _project_block(a_all, b_all, logz, proj):
    """exp(gamma) @ proj for one block: (block, S) x (S, M) -> (block, M).
    Pinned to HIGHEST precision — the TPU default rounds f32 operands to
    bf16 on the MXU (same rule as ring_viterbi_ovn._sel).

    gamma is renormalized PER t (logsumexp over states) after the global
    logz shift: identical in exact arithmetic (the row-lse of a+b-logz is
    0), but in f32 it absorbs the in-block log-score drift that a global
    normalizer leaves in the exponent — measured 2e-2 -> 6e-5 max
    marginal error at the production overlap config
    (scripts/posterior_error_study.py; the r04 parity record's windowed
    'error' was in fact THIS path's drift)."""
    g = a_all + b_all - logz
    g = g - logsumexp_rows(g, axis=1)[:, None]
    return jnp.matmul(jnp.exp(g), proj,
                      precision=jax.lax.Precision.HIGHEST)


# --------------------------------------------------------------------------
# Ring-structured (gather-free) log-plus blocks — the TPU fast path.
#
# The gather-table scans above work on any topology but lower to
# scalar-core gathers on TPU and compile slowly at overlap sizes; the ring
# topology makes forward AND backward structural (the same argument as
# ops/ring_viterbi.py, with logsumexp in place of max). Engines cover
# every topology: non-overlap any N, the specialized N=2 pair space, and
# the table-driven any-N overlap space — each generic over the emission
# model, so the single-channel (raw samples) and multi-channel
# (factorized streams) front-ends share the recursions verbatim. The
# gather engine above remains the universal oracle/fallback. Flat state
# order matches core/state_space exactly, so the (S, M) projection
# applies unchanged.
# --------------------------------------------------------------------------


def _ring_consts(mu, sigma, lp, dtype):
    mu = jnp.asarray(mu, dtype)
    sigma = jnp.asarray(sigma, dtype)
    lp = jnp.asarray(lp, dtype)
    lpz = jnp.log1p(-jnp.exp(jnp.sum(lp)))
    from ..utils.logmath import HALF_LOG_2PI

    log_sigma = jnp.log(sigma)
    inv_2s2 = 1.0 / (2.0 * sigma * sigma)
    econst = -HALF_LOG_2PI - log_sigma
    return mu, lp, lpz, econst, inv_2s2


def _first_rest(inps):
    """Split pytree scan inputs into (t=0 leaf slice, remaining slices)."""
    return (jax.tree.map(lambda a: a[0], inps),
            jax.tree.map(lambda a: a[1:], inps))


def _reverse_scan(bstep, carry, inps, valid):
    """Reverse scan with optional per-step validity masking: an invalid
    step passes the carry through unchanged (and emits it as its row).
    The chained-window driver uses this to place beta[T-1] = 0 exactly
    at the true signal end inside a zero-padded tail window — the pad
    steps beyond T leave the terminal carry untouched."""
    if valid is None:
        return jax.lax.scan(bstep, carry, inps, reverse=True)

    def mstep(c, inp_v):
        inp, v = inp_v
        new, _ = bstep(c, inp)
        out = jax.tree.map(lambda a, b: jnp.where(v, a, b), new, c)
        return out, out

    return jax.lax.scan(mstep, carry, (inps, valid), reverse=True)


def _nov_fb_scan(carry_flat, inps, em, w, N, Km1, *, first, reverse,
                 valid=None):
    """Non-overlap log-plus block scan, generic over the emission model
    (`em(inp_t) -> (es, ebm)`) — wraps ops/ring_fb's structural step
    functions (single source of truth for the transition structure).

    reverse=False: alphas for the block given the entry alpha (flat);
    reverse=True: betas for steps t in the block given the exit beta and
    inps = the NEXT step's emission inputs per step.
    Returns (carry_out_flat, rows (blk, S) flat in state order).
    """
    from ..ops.ring_fb import _bwd_step, _flat, _fwd_step, _unflat

    if not reverse:
        def fstep(carry, inp):
            vs, vb = _unflat(carry, N, Km1)
            es, ebm = em(inp)
            vs, vb = _fwd_step(vs, vb, es, ebm, w)
            out = _flat(vs, vb)
            return out, out

        if first:
            inp0, rest = _first_rest(inps)
            es0, eb0 = em(inp0)
            a0 = _flat(es0, eb0)
            c, rows = jax.lax.scan(fstep, a0, rest)
            return c, jnp.concatenate([a0[None], rows], axis=0)
        return jax.lax.scan(fstep, carry_flat, inps)

    def bstep(carry, inp):
        bs, bb = _unflat(carry, N, Km1)
        es, ebm = em(inp)
        bs, bb = _bwd_step(bs, bb, es, ebm, w)
        out = _flat(bs, bb)
        return out, out

    return _reverse_scan(bstep, carry_flat, inps, valid)


@partial(jax.jit, static_argnames=("first", "reverse"))
def _nov_fb_block(carry_flat, y_blk, lp, mu, sigma, *, first: bool,
                  reverse: bool, valid=None):
    """Single-channel non-overlap block (raw-sample emission)."""
    from ..ops.ring_fb import _emission_fns, _weights

    dtype = mu.dtype
    K, N = mu.shape
    lp = jnp.asarray(lp, dtype)
    return _nov_fb_scan(carry_flat, y_blk.astype(dtype),
                        _emission_fns(mu, sigma), _weights(lp, dtype),
                        N, K - 1, first=first, reverse=reverse,
                        valid=valid)


@partial(jax.jit, static_argnames=("first", "reverse"))
def _nov_fb_block_mc(carry_flat, es_blk, d_blk, lp, c1, *, first: bool,
                     reverse: bool, valid=None):
    """Multi-channel non-overlap block, consuming the factorized stream
    slices of core/emission_mc.mc_streams: eb = (es + d) - c1 (the
    ring_viterbi_mc association)."""
    from ..ops.ring_fb import _weights

    from ..ops.ring_viterbi_mc import mc_em_nov

    dtype = es_blk.dtype
    N, Km1 = d_blk.shape[1], d_blk.shape[2]
    lp = jnp.asarray(lp, dtype)
    em_sd = mc_em_nov(c1)

    def em(inp):
        return em_sd(*inp)

    return _nov_fb_scan(carry_flat, (es_blk, d_blk), em,
                        _weights(lp, dtype), N, Km1,
                        first=first, reverse=reverse, valid=valid)


def _ov2_fb_scan(carry_flat, inps, em, lp, lpz, Km1, *, first, reverse,
                 valid=None):
    """N=2 pairwise-overlap log-plus block scan, generic over the
    emission model (`em(inp_t) -> (es, e0, e1, ep)`).

    Same contract as _nov_fb_scan. Structural cases mirror
    ops/ring_viterbi.ring_viterbi_ov2 (forward) and their exact edge
    transposition (backward); flat order [silent | sgl0 | sgl1 | pair
    k1-major] is the state_space enumeration.
    """
    lp0, lp1 = lp[0], lp[1]

    def unflat(f):
        return (f[0], f[1:1 + Km1], f[1 + Km1:1 + 2 * Km1],
                f[1 + 2 * Km1:].reshape(Km1, Km1))

    def flat(vs, v0, v1, vp):
        return jnp.concatenate([vs[None], v0, v1, vp.reshape(-1)])

    if not reverse:
        def fstep(carry, y_t):
            vs, v0, v1, vp = unflat(carry)
            es, e0, e1, ep = em(y_t)
            new_vs = logsumexp_rows(
                jnp.stack([vs + 2 * lpz, v0[-1] + lpz, v1[-1] + lpz,
                           vp[-1, -1]]), axis=0) + es
            on0 = jnp.logaddexp(vs + lp0 + lpz, v1[-1] + lp0)
            on1 = jnp.logaddexp(vs + lp1 + lpz, v0[-1] + lp1)
            r0 = jnp.logaddexp(v0[:-1] + lpz, vp[:-1, -1])
            r1 = jnp.logaddexp(v1[:-1] + lpz, vp[-1, :-1])
            new_v0 = jnp.concatenate([on0[None], r0]) + e0
            new_v1 = jnp.concatenate([on1[None], r1]) + e1
            top = jnp.concatenate([(vs + lp0 + lp1)[None], v1[:-1] + lp0])
            left = v0[:-1] + lp1
            new_vp = jnp.concatenate(
                [top[None, :],
                 jnp.concatenate([left[:, None], vp[:-1, :-1]], axis=1)],
                axis=0) + ep
            out = flat(new_vs, new_v0, new_v1, new_vp)
            return out, out

        if first:
            inp0, rest = _first_rest(inps)
            es0, e00, e10, ep0 = em(inp0)
            a0 = flat(es0, e00, e10, ep0)
            c, rows = jax.lax.scan(fstep, a0, rest)
            return c, jnp.concatenate([a0[None], rows], axis=0)
        return jax.lax.scan(fstep, carry_flat, inps)

    def bstep(carry, y_next):
        bs, b0, b1, bp = unflat(carry)
        es, e0, e1, ep = em(y_next)
        BS = bs + es
        B0 = b0 + e0
        B1 = b1 + e1
        BP = bp + ep
        # silent -> silent | onset0 | onset1 | pair corner
        new_bs = logsumexp_rows(
            jnp.stack([BS + 2 * lpz, B0[0] + lp0 + lpz, B1[0] + lp1 + lpz,
                       BP[0, 0] + lp0 + lp1]), axis=0)
        # sgl(0,k): k<K-1 -> sgl(0,k+1)+lpz | pair(k+1,1)+lp1;
        #           k=K-1 -> silent+lpz | sgl(1,1)+lp1
        body0 = jnp.logaddexp(B0[1:] + lpz, BP[1:, 0] + lp1)
        end0 = jnp.logaddexp(BS + lpz, B1[0] + lp1)
        new_b0 = jnp.concatenate([body0, end0[None]])
        body1 = jnp.logaddexp(B1[1:] + lpz, BP[0, 1:] + lp0)
        end1 = jnp.logaddexp(BS + lpz, B0[0] + lp0)
        new_b1 = jnp.concatenate([body1, end1[None]])
        # pair(k1,k2): interior -> diagonal; last col -> sgl(0,k1+1);
        # last row -> sgl(1,k2+1); corner -> silent (all weight 0)
        interior = BP[1:, 1:]
        lastcol = B0[1:][:, None]                       # (K-2, 1)
        lastrow = jnp.concatenate([B1[1:], BS[None]])   # (K-1,)
        new_bp = jnp.concatenate(
            [jnp.concatenate([interior, lastcol], axis=1),
             lastrow[None, :]], axis=0)
        out = flat(new_bs, new_b0, new_b1, new_bp)
        return out, out

    return _reverse_scan(bstep, carry_flat, inps, valid)


@partial(jax.jit, static_argnames=("first", "reverse"))
def _ov2_fb_block(carry_flat, y_blk, lp, mu, sigma, *, first: bool,
                  reverse: bool, valid=None):
    """Single-channel N=2 overlap block (raw-sample emission)."""
    dtype = mu.dtype
    Km1 = mu.shape[0] - 1
    mu, lp, lpz, econst, inv_2s2 = _ring_consts(mu, sigma, lp, dtype)
    silent_mean = mu[0, 0] + mu[0, 1]
    b0_mean = mu[1:, 0] + mu[0, 1]
    b1_mean = mu[1:, 1] + mu[0, 0]
    pair_mean = mu[1:, 0][:, None] + mu[1:, 1][None, :]

    def em(v):
        def g(m):
            d = v - m
            return econst - d * d * inv_2s2

        return g(silent_mean), g(b0_mean), g(b1_mean), g(pair_mean)

    return _ov2_fb_scan(carry_flat, y_blk.astype(dtype), em, lp, lpz, Km1,
                        first=first, reverse=reverse, valid=valid)


@partial(jax.jit, static_argnames=("first", "reverse"))
def _ov2_fb_block_mc(carry_flat, es_blk, d_blk, lp, c1, x2, *,
                     first: bool, reverse: bool, valid=None):
    """Multi-channel N=2 overlap block from the factorized streams —
    the exact emission of the ov2 MC Viterbi scan
    (ops/ring_viterbi_mc.mc_em_ov2, cross-form pair table x2)."""
    from ..ops.ring_viterbi_mc import mc_em_ov2

    dtype = es_blk.dtype
    Km1 = d_blk.shape[2]
    lp = jnp.asarray(lp, dtype)
    lpz = jnp.log1p(-jnp.exp(jnp.sum(lp)))
    em_sd = mc_em_ov2(c1, x2)

    def em(inp):
        return em_sd(*inp)

    return _ov2_fb_scan(carry_flat, (es_blk, d_blk), em, lp, lpz, Km1,
                        first=first, reverse=reverse, valid=valid)


def _ovn_fb_scan(carry_flat, inps, em, lp, N, Km1, dtype, *,
                 first, reverse, valid=None):
    """Any-N pairwise-overlap log-plus block scan, generic over the
    emission model (`em(inp_t) -> (es, eb (N, K-1), ep (P, K-1, K-1))`).

    Same contract as _nov_fb_scan. The forward mirrors
    ops/ring_viterbi_ovn._ovn_core's structural candidate assembly with
    logsumexp in place of first-max; the backward is its exact edge
    transposition, with the third-member handoffs selected through the
    same one-hot-matmul pattern (for every (source, slot) exactly one of
    the paired selections is active, so the additive 0 of the inactive
    one is harmless — scores are finite). Flat order [silent | singles
    n-major | pair grids i-major, k1-major] is the state_space
    enumeration.
    """
    from ..ops.ring_viterbi_ovn import OvnTables, _pairs, _sel

    pairs = _pairs(N)
    P = len(pairs)
    lp = jnp.asarray(lp, dtype)
    lpz = jnp.log1p(-jnp.exp(jnp.sum(lp)))

    # static topology tables — the Viterbi core's own (one home for the
    # overlap-topology encoding; see ops/ring_viterbi_ovn.OvnTables)
    tab = OvnTables(N, dtype)
    nO = tab.nO
    OH_ring_i, OH_ring_j = tab.OH_ring_i, tab.OH_ring_j
    OH_row_i, OH_row_j = tab.OH_row_i, tab.OH_row_j
    OH_col_i, OH_col_j = tab.OH_col_i, tab.OH_col_j
    OH_imem, OH_jmem = tab.OH_imem, tab.OH_jmem
    mask_diag, mask_inpair = tab.mask_diag, tab.mask_inpair
    mask_member, mask_nondis = tab.mask_member, tab.mask_nondis
    lp_i = lp[jnp.asarray(tab.pairs_i)]
    lp_j = lp[jnp.asarray(tab.pairs_j)]
    # third-member onset weights for the backward handoffs (lp of the
    # freshly-onsetting member m)
    lp_m = lp[jnp.asarray(tab.m_idx)] if nO else None      # (P, nO)

    SB = N * Km1

    def unflat(f):
        return (f[0], f[1:1 + SB].reshape(N, Km1),
                f[1 + SB:].reshape(P, Km1, Km1))

    def flat(vs, vb, vp):
        return jnp.concatenate([vs[None], vb.reshape(-1), vp.reshape(-1)])

    if not reverse:
        def fstep(carry, y_t):
            vs, vb, vp = unflat(carry)
            es, eb, ep = em(y_t)
            ends = vb[:, -1]
            p_end = vp[:, -1, -1]
            colend = vp[:, :-1, -1]                            # (P, K-2)
            rowend = vp[:, -1, :-1]

            new_vs = logsumexp_rows(jnp.concatenate([
                (vs + N * lpz)[None],
                ends + (N - 1) * lpz,
                p_end + (N - 2) * lpz]), axis=0) + es

            on = logsumexp_rows(jnp.concatenate([
                (vs + lp + (N - 1) * lpz)[:, None],
                ends[None, :] + lp[:, None] + (N - 2) * lpz + mask_diag,
                p_end[None, :] + lp[:, None] + (N - 3) * lpz + mask_inpair,
            ], axis=1), axis=1)                                # (N,)

            pair_src = (_sel(OH_ring_i, colend)
                        + _sel(OH_ring_j, rowend)).reshape(
                            N, max(N - 1, 1), Km1 - 1)
            ring = logsumexp_rows(jnp.concatenate(
                [(vb[:, :-1] + (N - 1) * lpz)[:, None, :],
                 pair_src + (N - 2) * lpz], axis=1), axis=1)   # (N, K-2)
            new_vb = jnp.concatenate([on[:, None], ring], axis=1) + eb

            lpij = lp_i + lp_j
            corner = logsumexp_rows(jnp.concatenate([
                (vs + lpij + (N - 2) * lpz)[:, None],
                ends[None, :] + lpij[:, None] + (N - 3) * lpz
                + mask_member,
                p_end[None, :] + lpij[:, None] + (N - 4) * lpz
                + mask_nondis,
            ], axis=1), axis=1)                                # (P,)

            slot0r = (_sel(OH_jmem, vb[:, :-1])
                      + lp_i[:, None] + (N - 2) * lpz)[:, None, :]
            if nO:
                rsrc = (_sel(OH_row_i, colend)
                        + _sel(OH_row_j, rowend)).reshape(P, nO, Km1 - 1)
                rc = jnp.concatenate(
                    [slot0r, rsrc + lp_i[:, None, None] + (N - 3) * lpz],
                    axis=1)
            else:
                rc = slot0r
            row_best = logsumexp_rows(rc, axis=1)              # (P, K-2)

            slot0c = (_sel(OH_imem, vb[:, :-1])
                      + lp_j[:, None] + (N - 2) * lpz)[:, None, :]
            if nO:
                csrc = (_sel(OH_col_i, colend)
                        + _sel(OH_col_j, rowend)).reshape(P, nO, Km1 - 1)
                kc = jnp.concatenate(
                    [slot0c, csrc + lp_j[:, None, None] + (N - 3) * lpz],
                    axis=1)
            else:
                kc = slot0c
            col_best = logsumexp_rows(kc, axis=1)

            interior = vp[:, :-1, :-1] + (N - 2) * lpz
            top = jnp.concatenate([corner[:, None], row_best], axis=1)
            rest = jnp.concatenate([col_best[:, :, None], interior],
                                   axis=2)
            new_vp = jnp.concatenate([top[:, None, :], rest], axis=1) + ep
            out = flat(new_vs, new_vb, new_vp)
            return out, out

        if first:
            inp0, rest = _first_rest(inps)
            es0, eb0, ep0 = em(inp0)
            a0 = flat(es0, eb0, ep0)
            c, rows = jax.lax.scan(fstep, a0, rest)
            return c, jnp.concatenate([a0[None], rows], axis=0)
        return jax.lax.scan(fstep, carry_flat, inps)

    def bstep(carry, y_next):
        bs, bb, bp = unflat(carry)
        es, eb, ep = em(y_next)
        BS = bs + es
        BB = bb + eb                                           # (N, K-1)
        BP = bp + ep                                           # (P, ..)
        onset0 = BB[:, 0] + lp                                 # (N,)
        corner0 = BP[:, 0, 0] + lp_i + lp_j                    # (P,)

        # silent -> self | onsets | pair corners
        new_bs = logsumexp_rows(jnp.concatenate([
            (BS + N * lpz)[None],
            onset0 + (N - 1) * lpz,
            corner0 + (N - 2) * lpz]), axis=0)

        # single(n, k <= K-2) -> same ring | pair col/row entry with n
        # continuing (transpose of the fwd col/row slot-0 candidates)
        pair_back = (_sel(OH_ring_i, BP[:, 1:, 0] + lp_j[:, None])
                     + _sel(OH_ring_j, BP[:, 0, 1:] + lp_i[:, None])
                     ).reshape(N, max(N - 1, 1), Km1 - 1)
        body = logsumexp_rows(jnp.concatenate(
            [(BB[:, 1:] + (N - 1) * lpz)[:, None, :],
             pair_back + (N - 2) * lpz], axis=1), axis=1)      # (N, K-2)

        # single(n, K-1) -> silent | onset m != n | corner of pairs w/o n
        end = logsumexp_rows(jnp.concatenate([
            jnp.broadcast_to((BS + (N - 1) * lpz)[None, None], (N, 1)),
            onset0[None, :] + (N - 2) * lpz + mask_diag,
            corner0[None, :] + (N - 3) * lpz + mask_inpair,
        ], axis=1), axis=1)                                    # (N,)
        new_bb = jnp.concatenate([body, end[:, None]], axis=1)

        # pair interiors -> diagonal
        interior = BP[:, 1:, 1:] + (N - 2) * lpz               # (P, K-2, K-2)

        # pair(q)@(k1, K-1), k1 <= K-2: j exits; i continues to single
        # or joins a fresh onset partner (transpose of fwd ring/row/col
        # third-member selections)
        sgl_i = _sel(OH_imem, BB[:, 1:])                       # (P, K-2)
        if nO:
            colpart = (_sel(OH_col_i, BP[:, 1:, 0])
                       + _sel(OH_col_j, BP[:, 0, 1:])).reshape(
                           P, nO, Km1 - 1) + lp_m[:, :, None]
            lastcol = logsumexp_rows(jnp.concatenate(
                [(sgl_i + (N - 2) * lpz)[:, None, :],
                 colpart + (N - 3) * lpz], axis=1), axis=1)
        else:
            lastcol = sgl_i + (N - 2) * lpz                    # (P, K-2)

        # pair(q)@(K-1, k2), k2 <= K-2: i exits; j continues
        sgl_j = _sel(OH_jmem, BB[:, 1:])
        if nO:
            rowpart = (_sel(OH_row_i, BP[:, 1:, 0])
                       + _sel(OH_row_j, BP[:, 0, 1:])).reshape(
                           P, nO, Km1 - 1) + lp_m[:, :, None]
            lastrow = logsumexp_rows(jnp.concatenate(
                [(sgl_j + (N - 2) * lpz)[:, None, :],
                 rowpart + (N - 3) * lpz], axis=1), axis=1)
        else:
            lastrow = sgl_j + (N - 2) * lpz

        # pair(q)@(K-1, K-1): both exit -> silent | onset n not in q |
        # corner of disjoint pairs
        pcorner = logsumexp_rows(jnp.concatenate([
            jnp.broadcast_to((BS + (N - 2) * lpz)[None, None], (P, 1)),
            onset0[None, :] + (N - 3) * lpz + mask_member,
            corner0[None, :] + (N - 4) * lpz + mask_nondis,
        ], axis=1), axis=1)                                    # (P,)

        right = jnp.concatenate([lastcol[:, :, None],
                                 pcorner[:, None, None]], axis=1)
        new_bp = jnp.concatenate(
            [jnp.concatenate([interior, lastrow[:, None, :]], axis=1),
             right], axis=2)
        out = flat(new_bs, new_bb, new_bp)
        return out, out

    return _reverse_scan(bstep, carry_flat, inps, valid)


@partial(jax.jit, static_argnames=("first", "reverse"))
def _ovn_fb_block(carry_flat, y_blk, lp, mu, sigma, *, first: bool,
                  reverse: bool, valid=None):
    """Single-channel any-N overlap block (raw-sample emission)."""
    from ..ops.ring_viterbi_ovn import sc_em_ovn

    dtype = mu.dtype
    K, N = mu.shape
    mu = jnp.asarray(mu, dtype)
    lp = jnp.asarray(lp, dtype)
    em = sc_em_ovn(mu, sigma)
    return _ovn_fb_scan(carry_flat, y_blk.astype(dtype), em, lp, N, K - 1,
                        dtype, first=first, reverse=reverse, valid=valid)


@partial(jax.jit, static_argnames=("first", "reverse"))
def _ovn_fb_block_mc(carry_flat, es_blk, d_blk, lp, c1, c2, *,
                     first: bool, reverse: bool, valid=None):
    """Multi-channel any-N overlap block from the factorized streams:
    eb = (es + d) - c1; ep[q] = ((es + d_i) + d_j) - c2[q] (direct-form
    pair tables, pairs i-major — the ovn MC association)."""
    from ..ops.ring_viterbi_mc import mc_em_ovn
    from ..ops.ring_viterbi_ovn import _pairs

    dtype = es_blk.dtype
    N, Km1 = d_blk.shape[1], d_blk.shape[2]
    lp = jnp.asarray(lp, dtype)
    em_sd = mc_em_ovn(c1, c2, _pairs(N))

    def em(inp):
        return em_sd(*inp)

    return _ovn_fb_scan(carry_flat, (es_blk, d_blk), em, lp, N, Km1,
                        dtype, first=first, reverse=reverse, valid=valid)


def _sc_engine_name(templates) -> str:
    """The one topology -> engine rule (N < 2 overlap spaces have no
    pair columns and ARE the non-overlap space)."""
    if not templates.allow_overlaps or templates.n_neurons < 2:
        return "nov"
    return "ov2" if templates.n_neurons == 2 else "ovn"


_SC_FB = {"nov": _nov_fb_block, "ov2": _ov2_fb_block,
          "ovn": _ovn_fb_block}


def _ring_fb_block_fn(templates):
    """Structural log-plus block engine for the topology (the gather
    engine remains as the universal oracle/fallback)."""
    return _SC_FB[_sc_engine_name(templates)]


def _two_pass(run, T, S, block, proj, dtype) -> np.ndarray:
    """Shared checkpointed two-pass driver over `run(carry, lo, hi,
    first, reverse) -> (carry_out, rows)` block engines.

    Between blocks the carry is re-centered at 0 and the shift kept as a
    host float64 offset: log-scores drift by ~|log p(y_t)| per sample,
    so an unnormalized f32 alpha at T = 2^17 sits at ~1e5 magnitude and
    the mantissa can no longer resolve the O(1) structure gamma depends
    on (measured: posterior onset mass 35% low). Offsets cancel exactly
    in gamma = alpha + beta - logZ.
    """
    starts = list(range(0, T, block))
    entries = [None] * len(starts)                   # alpha checkpoint
    out = [None] * len(starts)
    off_a = [0.0] * len(starts)                      # alpha offset at entry
    a_carry = jnp.zeros((S,), dtype)
    off = 0.0
    for i, s in enumerate(starts):
        e = min(s + block, T)
        entries[i] = a_carry
        off_a[i] = off
        a_carry, _ = run(a_carry, s, e, i == 0, False)
        shift = float(jnp.max(a_carry))
        a_carry = a_carry - dtype.type(shift)
        off += shift
    logz = float(logsumexp_rows(a_carry, axis=-1)) + off
    b_carry = jnp.zeros((S,), dtype)                 # beta[T-1] = 0
    off_b = 0.0
    for i in range(len(starts) - 1, -1, -1):
        s = starts[i]
        e = min(s + block, T)
        _, a_all = run(entries[i], s, e, i == 0, False)
        if e == T:
            b_carry, b_rest = run(b_carry, s + 1, T, False, True)
            b_all = jnp.concatenate(
                [b_rest, jnp.zeros((1, S), dtype)], axis=0)
        else:
            b_carry, b_all = run(b_carry, s + 1, e + 1, False, True)
        logz_blk = dtype.type(logz - off_a[i] - off_b)
        out[i] = _project_block(a_all, b_all, logz_blk, proj)
        shift = float(jnp.max(b_carry))
        b_carry = b_carry - dtype.type(shift)
        off_b += shift
    return np.concatenate([np.asarray(o) for o in out], axis=0)


def onset_posteriors(templates, y, *, block: int = 8192,
                     proj=None, _force_gather: bool = False) -> np.ndarray:
    """(T, N) marginal posterior that neuron n onsets at sample t, under
    the model's decode topology (allow_overlaps included).

    templates: models.api.HMMTemplateModel (or anything exposing
    state_space/mu/sigma/lp). proj overrides the (S, M) projection —
    e.g. ``(states > 0).T`` for "actively spiking" marginals instead of
    onsets; default onset_projection. _force_gather bypasses the
    structural engines (test anchor). For multi-channel models use
    onset_posteriors_mc.
    """
    y = np.asarray(y)
    if y.ndim != 1:
        raise ValueError(
            "onset_posteriors takes a (T,) trace; for multi-channel "
            "(T, C) recordings use onset_posteriors_mc")
    ss = templates.state_space
    dtype = jnp.zeros(0).dtype                       # default jax float
    if proj is None:
        proj = onset_projection(ss.states)
    proj = jnp.asarray(proj, dtype)
    y = jnp.asarray(y, dtype)
    T = y.shape[0]
    S = ss.nstates
    block = max(2, min(block, T))

    fbfn = None if _force_gather else _ring_fb_block_fn(templates)
    if fbfn is not None:
        # structural (gather-free) path — the TPU fast engines
        lp_d = jnp.asarray(templates.lp, dtype)
        mu_d = jnp.asarray(templates.mu, dtype)
        sg_d = jnp.asarray(templates.sigma, dtype)

        def run(carry, lo, hi, first, reverse):
            return fbfn(carry, y[lo:hi], lp_d, mu_d, sg_d,
                        first=first, reverse=reverse)

        return _two_pass(run, T, S, block, proj, dtype)

    # generic gather-table path — any topology, kept as the universal
    # test oracle (_force_gather); the structural engines above cover
    # every production topology. Shares the _two_pass driver (checkpoint,
    # re-centering, last-block beta splice) with them; each pass simply
    # recomputes the block's (block, S) emission table — fine on a
    # non-production path.
    in_idx, in_w = ss.in_table(templates.lp)
    out_idx, out_w = ss.out_table(templates.lp)
    smu = state_means(jnp.asarray(ss.states),
                      jnp.asarray(templates.mu, dtype))
    sigma = jnp.asarray(templates.sigma, dtype)
    in_idx = jnp.asarray(in_idx)
    in_w = jnp.asarray(in_w, dtype)
    out_idx = jnp.asarray(out_idx)
    out_w = jnp.asarray(out_w, dtype)

    def run(carry, lo, hi, first, reverse):
        em_blk = emission_logprob(y[lo:hi], smu, sigma)
        if not reverse:
            return _alpha_block(carry, em_blk, in_idx, in_w, first=first)
        return _beta_block(carry, em_blk, out_idx, out_w)

    return _two_pass(run, T, S, block, proj, dtype)


def _check_window_f32(W, dtype):
    """The windowed engines run each halo window's FB as one cold-started
    scan with NO inter-block re-centering (unlike _two_pass), so the f32
    carry drifts ~|log p(y_t)| (~1.5) per sample *inside* the window.
    Past W ~ 1e5 the drifted magnitude eats the mantissa headroom the
    O(1) gamma structure needs; refuse rather than silently degrade."""
    if dtype == jnp.float32 and W > 131072:
        raise ValueError(
            f"window W={W} is too long for f32 windowed posteriors (the "
            "in-window log-score drift outruns the f32 mantissa); lower "
            "L/H, enable f64, or use the exact onset_posteriors path")


@partial(jax.jit, static_argnames=("engine",))
def _windowed_gamma_sc(y_win, lp_w, mu_w, sg_w, proj, *, engine: str):
    """Per-window FB + per-t-normalized projected gamma, vmapped over
    halo windows. Each window cold-starts (emission-only alpha at its
    first sample, beta = 0 at its last) — exact at the true signal
    edges, forgetting-limited elsewhere; per-t renormalization absorbs
    the window-local scale so only the O(decay^H) boundary mixing error
    remains in the core region.

    The model parameters carry a leading window axis (lp_w (B, N), mu_w
    (B, K, N), sg_w (B,)): the stationary caller broadcasts one
    parameter set, the drift-tracked caller passes each window's own
    adapted templates (train/adaptive.py)."""
    fb = _SC_FB[engine]
    S = proj.shape[0]
    dtype = mu_w.dtype

    def one(yw, lp, mu, sigma):
        _, a_all = fb(jnp.zeros((S,), dtype), yw, lp, mu, sigma,
                      first=True, reverse=False)
        _, b_rest = fb(jnp.zeros((S,), dtype), yw[1:], lp, mu, sigma,
                       first=False, reverse=True)
        b_all = jnp.concatenate([b_rest, jnp.zeros((1, S), dtype)], axis=0)
        g = a_all + b_all
        g = g - logsumexp_rows(g, axis=1)[:, None]
        return jnp.matmul(jnp.exp(g), proj,
                          precision=jax.lax.Precision.HIGHEST)

    return jax.vmap(one)(y_win, lp_w, mu_w, sg_w)


def _window_starts(T, L, H, B, W):
    """Global start position of each halo window, derived from
    parallel/overlap_save._edge_rows so the clamping rule has one home
    (uniform row b starts at b*L - H; an edge row's realign shift IS its
    offset from the uniform start)."""
    from ..parallel.overlap_save import _edge_rows

    shifts = _edge_rows(T, L, H, B, W)
    return [b * L - H + shifts.get(b, 0) for b in range(B)]


def _windowed_sc_run(y, *, T, L, H, B, W, proj_d, batch_windows,
                     lp_all, mu_all, sg_all, engine, dtype) -> np.ndarray:
    """Shared window-batch loop of the stationary and drift-tracked fast
    posteriors: build halo windows, run _windowed_gamma_sc per batch
    (per-window parameter rows ride along), scatter each window's core
    rows into the output."""
    from ..parallel.overlap_save import _build_windows

    y_win, _ = _build_windows(jnp.asarray(y, dtype), T=T, L=L, H=H,
                              B=B, W=W)
    starts = _window_starts(T, L, H, B, W)
    S = proj_d.shape[0]
    M = proj_d.shape[1]
    if batch_windows is None:
        # two (W, S) float planes live per window in flight; ~2 GB keeps
        # well inside v5e HBM and sits at the measured throughput knee
        # (T=2^20, S=3600: bw 3 -> 152k, 8 -> 348k, 16 -> 446k, 32 ->
        # 464k samples/s)
        batch_windows = max(1, int(2e9 // (2 * W * S * 4)))
    batch_windows = min(batch_windows, B)   # never pad past the real work

    out = np.empty((T, M), np.float64)
    for i in range(0, B, batch_windows):
        nw = min(batch_windows, B - i)
        yb = y_win[i:i + nw]
        lpb = lp_all[i:i + nw]
        mub = mu_all[i:i + nw]
        sgb = sg_all[i:i + nw]
        if nw < batch_windows:
            # pad the ragged tail batch to the one compiled shape
            # (windows are independent; padded outputs are discarded;
            # sigma pads to 1 and lp to log(1/2N) — NOT 0, which would
            # make lpz = log1p(-exp(sum lp)) = -inf and fill the dead
            # lanes with NaN gammas that trip jax_debug_nans)
            pad = batch_windows - nw
            lp_fill = float(np.log(0.5 / max(lpb.shape[-1], 1)))
            yb = jnp.concatenate([yb, jnp.zeros((pad, W), yb.dtype)])
            lpb = jnp.concatenate(
                [lpb, jnp.full((pad,) + lpb.shape[1:], lp_fill,
                               lpb.dtype)])
            mub = jnp.concatenate(
                [mub, jnp.zeros((pad,) + mub.shape[1:], mub.dtype)])
            sgb = jnp.concatenate([sgb, jnp.ones((pad,), sgb.dtype)])
        gb = np.asarray(_windowed_gamma_sc(yb, lpb, mub, sgb, proj_d,
                                           engine=engine))
        for k in range(nw):
            b = i + k
            s0 = b * L
            e0 = T if b == B - 1 else s0 + L
            lo = s0 - starts[b]
            out[s0:e0] = gb[k, lo:lo + (e0 - s0)]
    return out


def onset_posteriors_windowed(templates, y, *, L: int = 4096,
                              H: int | None = None, proj=None,
                              batch_windows: int | None = None
                              ) -> np.ndarray:
    """Fast approximate onset marginals: halo-windowed forward-backward
    over overlap-save blocks, windows processed in PARALLEL (vmap) —
    the posterior mirror of the decode's overlap-save parallelization.

    Each window's FB cold-starts at its edges; the halo H absorbs the
    boundary effect geometrically (the chain's return-to-silence mixing).
    Measured at the production config (K=60, N=2 overlaps, S=3600,
    L=4096, scripts/posterior_error_study.py): the mixing error is
    ~3e-10 in f64 for every H >= K, and the f32 total error is ~6e-5 —
    the dtype noise floor, shared by every f32 posterior path. Tighten H
    upward only for pathological never-silent signals. Exact at the
    true signal edges.

    Prefer onset_posteriors_chained for the same window-parallel speed
    WITHOUT the mixing approximation (it is the model_posteriors
    default); spike_confidence(model, windowed=True) consumes this path.
    """
    y = np.asarray(y)
    if y.ndim != 1:
        raise ValueError("onset_posteriors_windowed takes a (T,) trace")
    ss = templates.state_space
    dtype = jnp.zeros(0).dtype
    if H is None:
        H = max(4 * templates.K, 64)
    T = y.shape[0]
    W = L + 2 * H
    B = -(-T // L)                  # ceil: the last core is [<B-1>*L, T)
    if H < 1 or L < 2 * H or B < 2 or T < W:
        return onset_posteriors(templates, y, proj=proj)
    _check_window_f32(W, dtype)
    if proj is None:
        proj = onset_projection(ss.states)
    proj_d = jnp.asarray(proj, dtype)

    lp_d = jnp.asarray(templates.lp, dtype)
    mu_d = jnp.asarray(templates.mu, dtype)
    sg_d = jnp.asarray(templates.sigma, dtype)
    return _windowed_sc_run(
        y, T=T, L=L, H=H, B=B, W=W, proj_d=proj_d,
        batch_windows=batch_windows,
        lp_all=jnp.broadcast_to(lp_d, (B,) + lp_d.shape),
        mu_all=jnp.broadcast_to(mu_d, (B,) + mu_d.shape),
        sg_all=jnp.broadcast_to(sg_d, (B,)),
        engine=_sc_engine_name(templates), dtype=dtype)


# --------------------------------------------------------------------------
# Exact parallel posteriors: chained windows (parallel-in-time two-pass).
#
# The windowed mode above is mixing-limited: each window cold-starts, so
# its core carries an O(decay^H) boundary error (~2e-2 max at the K=60
# production overlap config on hardware, TPU_PARITY_r04). The chained
# mode removes that error while KEEPING the window parallelism:
#
#   1. a cold forward sweep over disjoint L-windows (vmapped, O(S) memory
#      per window — scan row outputs are DCE'd) yields each window's
#      terminal alpha;
#   2. those terminals become the next window's ENTRY alpha — after one
#      such chaining the entry error is the cold-start error contracted
#      through a full L samples, decay^L, astronomically below f32/f64
#      noise for any L >> the chain's mixing time (window 0's entry is
#      the exact reference cold init);
#   3. the mirrored backward sweep chains exit betas right-to-left (the
#      last window's beta[T-1] = 0 is exact; the zero-padded tail is
#      handled by validity masking in _reverse_scan);
#   4. a final batched gamma pass rematerializes each window's alpha and
#      beta rows from its chained entry/exit and projects per-t
#      renormalized posteriors — numerically the exact sequential
#      two-pass up to decay^(refine*L) + dtype round-off (anchored at
#      1e-8 vs the gather oracle in f64 tests).
#
# `refine` repeats the chaining (entry error decay^(refine*L)) for
# pathological never-silent signals; refine=1 is exact to round-off on
# anything physiological. Cost: ~2x the windowed mode (4 sweeps vs 2),
# against the exact host-loop's per-block device syncs (3 orders slower).
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("engine", "first"))
def _chained_fwd_sweep(y_win, entries, lp, mu, sg, *, engine, first):
    """Terminal alpha of each (b, L) window given entry alphas (ignored
    when first=True: cold emission init). Row outputs are unused, so XLA
    DCE keeps this O(S) per window."""
    fb = _SC_FB[engine]

    def one(yw, en):
        c, _ = fb(en, yw, lp, mu, sg, first=first, reverse=False)
        return c

    return jax.vmap(one)(y_win, entries)


@partial(jax.jit, static_argnames=("engine",))
def _chained_bwd_sweep(y_next_win, valid, exits, lp, mu, sg, *, engine):
    """First-position beta of each window given exit betas: the reverse
    sweep mirror of _chained_fwd_sweep (inputs are the NEXT-step
    emissions; invalid pad steps pass the carry through)."""
    fb = _SC_FB[engine]

    def one(ynw, v, ex):
        c, _ = fb(ex, ynw, lp, mu, sg, first=False, reverse=True, valid=v)
        return c

    return jax.vmap(one)(y_next_win, valid, exits)


@partial(jax.jit, static_argnames=("engine", "first"))
def _chained_gamma_batch(y_win, y_next_win, valid, entries, exits,
                         lp, mu, sg, proj, *, engine, first):
    """Per-window alpha (from entry) + beta (from exit) rows, per-t
    renormalized, projected: the final pass of the chained two-pass."""
    fb = _SC_FB[engine]

    def one(yw, ynw, v, en, ex):
        _, a_all = fb(en, yw, lp, mu, sg, first=first, reverse=False)
        _, b_all = fb(ex, ynw, lp, mu, sg, first=False, reverse=True,
                      valid=v)
        g = a_all + b_all
        g = g - logsumexp_rows(g, axis=1)[:, None]
        return jnp.matmul(jnp.exp(g), proj,
                          precision=jax.lax.Precision.HIGHEST)

    return jax.vmap(one)(y_win, y_next_win, valid, entries, exits)


def _recenter(v):
    """Per-row max-shift of chained carries: gamma renormalizes per t, so
    only the O(1) structure matters and the shift keeps f32 finite."""
    return v - jnp.max(v, axis=1, keepdims=True)


def _pallas_gamma_ok(templates, dtype) -> bool:
    """Fused-kernel eligibility of the chained posteriors: TPU backend,
    non-overlap topology (N < 2 overlap spaces included), the kernels'
    K/N ceilings, f32 (the kernels are f32-only)."""
    from ..ops.pallas_gamma_mb import KP as _KP
    from ..ops.pallas_gamma_mb import NR as _NR
    from ..utils.platform import is_tpu_backend

    N = templates.n_neurons
    return ((not templates.allow_overlaps or N < 2)
            and 0 < N <= _NR and templates.K - 1 <= _KP
            and dtype == jnp.float32 and is_tpu_backend())


def _pallas_gamma_ov2_ok(templates, dtype) -> bool:
    """Fused-kernel eligibility of the chained posteriors on the N=2
    pairwise-overlap topology (the production confidence path)."""
    from ..ops.pallas_gamma_ov2 import KP as _KP
    from ..ops.pallas_gamma_ov2 import ov2_gamma_vmem_ok
    from ..utils.platform import is_tpu_backend

    return (templates.allow_overlaps and templates.n_neurons == 2
            and templates.K - 1 <= _KP and dtype == jnp.float32
            and is_tpu_backend() and ov2_gamma_vmem_ok())


def onset_posteriors_chained(templates, y, *, L: int = 4096,
                             refine: int = 1, proj=None,
                             batch_windows: int | None = None
                             ) -> np.ndarray:
    """EXACT (T, N) onset marginals with window parallelism — the chained
    two-pass (see the section comment above). Matches onset_posteriors
    to dtype round-off on every topology (nov / ov2 / any-N overlap) at
    a wall-clock within ~2x of the approximate windowed mode; on TPU the
    non-overlap topologies route to the fused Pallas backend
    (ops/pallas_gamma_mb — ~75M samples/s device-side at K=60 N=2,
    T=2^21; the (T, N) fetch dominates wall time on tunneled backends).

    L: window length (the parallel grain; decay^L bounds the chaining
    error). refine: extra chaining sweeps for pathological never-silent
    signals. proj/batch_windows as in onset_posteriors_windowed.
    """
    y = np.asarray(y)
    if y.ndim != 1:
        raise ValueError("onset_posteriors_chained takes a (T,) trace")
    ss = templates.state_space
    dtype = jnp.zeros(0).dtype
    T = y.shape[0]
    B = -(-T // L)
    if B < 2:
        return onset_posteriors(templates, y, proj=proj)
    _check_window_f32(L, dtype)
    if proj is None and _pallas_gamma_ok(templates, dtype):
        from ..ops.pallas_gamma_mb import _chunk as _gchunk
        from ..ops.pallas_gamma_mb import gamma_hbm_ok, onset_gammas_pallas

        ch = _gchunk(templates.n_neurons)
        if L % ch == 0 and gamma_hbm_ok(T, templates.n_neurons, L):
            return onset_gammas_pallas(
                np.asarray(y, np.float32), templates.lp, templates.mu,
                templates.sigma, L=L, refine=refine)
    if proj is None and _pallas_gamma_ov2_ok(templates, dtype):
        from ..ops.pallas_gamma_ov2 import (CH2, onset_gammas_pallas_ov2,
                                            ov2_gamma_hbm_ok)

        if L % CH2 == 0 and ov2_gamma_hbm_ok(T, L):
            return onset_gammas_pallas_ov2(
                np.asarray(y, np.float32), templates.lp, templates.mu,
                templates.sigma, L=L, refine=refine)
    if proj is None:
        proj = onset_projection(ss.states)
    proj_d = jnp.asarray(proj, dtype)
    S = ss.nstates
    M = proj_d.shape[1]
    engine = _sc_engine_name(templates)

    lp_d = jnp.asarray(templates.lp, dtype)
    mu_d = jnp.asarray(templates.mu, dtype)
    sg_d = jnp.asarray(templates.sigma, dtype)

    # host-side window/batching arrays: every slice/pad/concat below is
    # NumPy, so the only device programs are the three fixed-(bw, L)
    # jitted sweep/gamma functions — one compile serves any recording
    # length (eager jnp slicing would compile a tiny program per shape
    # through the remote compiler)
    npdtype = np.dtype(str(jnp.zeros(0, dtype).dtype))
    y_pad = np.zeros(B * L + 1, dtype=npdtype)
    y_pad[:T] = y
    y_win = y_pad[: B * L].reshape(B, L)
    y_next = y_pad[1 : B * L + 1].reshape(B, L)
    tpos = np.arange(B * L).reshape(B, L)
    valid = tpos < T - 1                   # beta step t uses em at t+1

    zeros = np.zeros((B, S), npdtype)
    if batch_windows is None:
        batch_windows = max(1, int(2e9 // (2 * L * S * 4)))
    bw = max(1, min(batch_windows, B))

    def _padb(x, nw):
        """Pad a ragged sweep batch to the one compiled (bw, ...) shape
        (windows are independent; padded outputs are discarded)."""
        if nw == bw:
            return x
        pad = bw - nw
        return np.concatenate(
            [x, np.zeros((pad,) + x.shape[1:], x.dtype)])

    def fwd_sweep(entries):
        """entries=None: all-cold sweep (window 0's cold init is the
        exact reference init). Else: window 0 cold, the rest chained."""
        outs = []
        for i in range(0, B, bw):
            nw = min(bw, B - i)
            yb = _padb(y_win[i : i + nw], nw)
            if entries is None:
                f = _chained_fwd_sweep(yb, _padb(zeros[:nw], nw), lp_d,
                                       mu_d, sg_d, engine=engine,
                                       first=True)
            elif i == 0:
                f0 = _chained_fwd_sweep(y_win[:1], zeros[:1], lp_d,
                                        mu_d, sg_d, engine=engine,
                                        first=True)
                if nw > 1:
                    fr = _chained_fwd_sweep(
                        _padb(y_win[1:nw], nw - 1),
                        _padb(entries[1:nw], nw - 1), lp_d, mu_d, sg_d,
                        engine=engine, first=False)[: nw - 1]
                    f = np.concatenate([np.asarray(f0), np.asarray(fr)])
                else:
                    f = np.asarray(f0)
                outs.append(f)
                continue
            else:
                f = _chained_fwd_sweep(yb, _padb(entries[i : i + nw], nw),
                                       lp_d, mu_d, sg_d, engine=engine,
                                       first=False)
            outs.append(np.asarray(f)[:nw])
        return np.concatenate(outs)

    def bwd_sweep(exits):
        outs = []
        for i in range(0, B, bw):
            nw = min(bw, B - i)
            outs.append(np.asarray(_chained_bwd_sweep(
                _padb(y_next[i : i + nw], nw),
                _padb(valid[i : i + nw], nw),
                _padb(exits[i : i + nw], nw), lp_d, mu_d, sg_d,
                engine=engine))[:nw])
        return np.concatenate(outs)

    def _np_recenter(v):
        return v - v.max(axis=1, keepdims=True)

    # forward chaining: cold sweep, then entry := predecessor's terminal
    finals = fwd_sweep(None)
    entries = np.concatenate([zeros[:1], _np_recenter(finals)[:-1]])
    for _ in range(max(0, refine - 1)):
        finals = fwd_sweep(entries)
        entries = np.concatenate([zeros[:1], _np_recenter(finals)[:-1]])

    # backward chaining: cold sweep (last window's 0 exit is exact),
    # then exit := successor's first-position beta
    bfirsts = bwd_sweep(zeros)
    exits = np.concatenate([_np_recenter(bfirsts)[1:], zeros[:1]])
    for _ in range(max(0, refine - 1)):
        bfirsts = bwd_sweep(exits)
        exits = np.concatenate([_np_recenter(bfirsts)[1:], zeros[:1]])

    # final gamma pass: window 0 cold (exact reference init), the rest
    # from their chained entries, in bounded-memory batches
    out = np.empty((T, M), np.float64)
    g0 = np.asarray(_chained_gamma_batch(
        y_win[:1], y_next[:1], valid[:1], zeros[:1], exits[:1],
        lp_d, mu_d, sg_d, proj_d, engine=engine, first=True))
    out[: min(L, T)] = g0[0, : min(L, T)]
    batch_windows = min(batch_windows, B - 1) if B > 1 else 1
    for i in range(1, B, batch_windows):
        nw = min(batch_windows, B - i)
        sl = slice(i, i + nw)
        yb, ynb, vb = y_win[sl], y_next[sl], valid[sl]
        enb, exb = entries[sl], exits[sl]
        if nw < batch_windows:
            pad = batch_windows - nw
            yb = np.concatenate([yb, np.zeros((pad, L), yb.dtype)])
            ynb = np.concatenate([ynb, np.zeros((pad, L), ynb.dtype)])
            vb = np.concatenate([vb, np.zeros((pad, L), bool)])
            enb = np.concatenate([enb, np.zeros((pad, S), enb.dtype)])
            exb = np.concatenate([exb, np.zeros((pad, S), exb.dtype)])
        gb = np.asarray(_chained_gamma_batch(
            yb, ynb, vb, enb, exb, lp_d, mu_d, sg_d, proj_d,
            engine=engine, first=False))
        for k in range(nw):
            b = i + k
            s0 = b * L
            e0 = min(s0 + L, T)
            out[s0:e0] = gb[k, : e0 - s0]
    return out


@partial(jax.jit, static_argnames=("engine", "first"))
def _chained_fwd_sweep_mc(es_win, d_win, entries, lp, tables, *,
                          engine, first):
    """MC mirror of _chained_fwd_sweep over factorized stream windows."""
    fb = _MC_FB[engine]

    def one(ew, dw, en):
        c, _ = fb(en, ew, dw, lp, *tables, first=first, reverse=False)
        return c

    return jax.vmap(one)(es_win, d_win, entries)


@partial(jax.jit, static_argnames=("engine",))
def _chained_bwd_sweep_mc(es_next, d_next, valid, exits, lp, tables, *,
                          engine):
    fb = _MC_FB[engine]

    def one(ew, dw, v, ex):
        c, _ = fb(ex, ew, dw, lp, *tables, first=False, reverse=True,
                  valid=v)
        return c

    return jax.vmap(one)(es_next, d_next, valid, exits)


@partial(jax.jit, static_argnames=("engine", "first"))
def _chained_gamma_batch_mc(es_win, d_win, es_next, d_next, valid,
                            entries, exits, lp, tables, proj, *,
                            engine, first):
    fb = _MC_FB[engine]

    def one(ew, dw, enw, dnw, v, en, ex):
        _, a_all = fb(en, ew, dw, lp, *tables, first=first,
                      reverse=False)
        _, b_all = fb(ex, enw, dnw, lp, *tables, first=False,
                      reverse=True, valid=v)
        g = a_all + b_all
        g = g - logsumexp_rows(g, axis=1)[:, None]
        return jnp.matmul(jnp.exp(g), proj,
                          precision=jax.lax.Precision.HIGHEST)

    return jax.vmap(one)(es_win, d_win, es_next, d_next, valid,
                         entries, exits)


def onset_posteriors_chained_mc(templates, yc, *, L: int = 4096,
                                refine: int = 1, proj=None,
                                batch_windows: int | None = None
                                ) -> np.ndarray:
    """EXACT multi-channel onset marginals with window parallelism — the
    chained two-pass of onset_posteriors_chained over the factorized
    channel streams. Streams are pointwise in t, so each phase computes
    its batch's stream windows from the raw (T, C) slice (windowing
    commutes with the channel collapse; nothing (T, N, K-1)-shaped is
    ever live)."""
    from .emission_mc import MCTables, mc_streams

    yc = np.asarray(yc)
    if yc.ndim != 2:
        raise ValueError("onset_posteriors_chained_mc takes (T, C)")
    ss = templates.state_space
    dtype = jnp.zeros(0).dtype
    T, C = yc.shape
    B = -(-T // L)
    if B < 2:
        return onset_posteriors_mc(templates, yc, proj=proj)
    _check_window_f32(L, dtype)
    if proj is None and _pallas_gamma_ok(templates, dtype):
        from ..ops.pallas_gamma_mb import _chunk as _gchunk
        from ..ops.pallas_gamma_mb import (gamma_hbm_ok,
                                           onset_gammas_pallas_mc)

        if (L % _gchunk(templates.n_neurons) == 0
                and gamma_hbm_ok(T, templates.n_neurons, L)):
            return onset_gammas_pallas_mc(
                np.asarray(yc, np.float32), templates.lp, templates.mu,
                templates.sigmas, L=L, refine=refine)
    if proj is None:
        proj = onset_projection(ss.states)
    proj_d = jnp.asarray(proj, dtype)
    S = ss.nstates
    M = proj_d.shape[1]
    engine = _sc_engine_name(templates)
    tables = MCTables(templates.mu, templates.sigmas)
    extra = _mc_extra_tables(engine, tables, dtype)
    lp_d = jnp.asarray(templates.lp, dtype)

    yc_pad = np.zeros((B * L + 1, C), dtype=yc.dtype)
    yc_pad[:T] = yc
    yc_pad = jnp.asarray(yc_pad, dtype)
    tpos = np.arange(B * L).reshape(B, L)
    valid_all = jnp.asarray(tpos < T - 1)

    if batch_windows is None:
        batch_windows = max(1, int(2e9 // (2 * L * S * 4)))
    bw = min(batch_windows, B)

    def batch_streams(i, nw):
        """Stream windows + next-step stream windows for windows
        [i, i+nw) — one mc_streams call over the contiguous slice."""
        seg = yc_pad[i * L : (i + nw) * L + 1]
        es_f, d_f = mc_streams(seg, tables, dtype=dtype)
        shp = d_f.shape[1:]
        return (es_f[:-1].reshape(nw, L),
                d_f[:-1].reshape((nw, L) + shp),
                es_f[1:].reshape(nw, L),
                d_f[1:].reshape((nw, L) + shp))

    zeros = jnp.zeros((B, S), dtype)

    def fwd_sweep(entries):
        """Full forward sweep in batches; entries=None -> all cold."""
        outs = []
        for i in range(0, B, bw):
            nw = min(bw, B - i)
            es_w, d_w, _, _ = batch_streams(i, nw)
            if entries is None:
                f = _chained_fwd_sweep_mc(es_w, d_w, zeros[:nw], lp_d,
                                          extra, engine=engine,
                                          first=True)
            elif i == 0:
                f0 = _chained_fwd_sweep_mc(es_w[:1], d_w[:1], zeros[:1],
                                           lp_d, extra, engine=engine,
                                           first=True)
                fr = (_chained_fwd_sweep_mc(
                    es_w[1:], d_w[1:], entries[1:nw], lp_d, extra,
                    engine=engine, first=False) if nw > 1 else
                    jnp.zeros((0, S), dtype))
                f = jnp.concatenate([f0, fr])
            else:
                f = _chained_fwd_sweep_mc(es_w, d_w, entries[i : i + nw],
                                          lp_d, extra, engine=engine,
                                          first=False)
            outs.append(f)
        return jnp.concatenate(outs)

    def bwd_sweep(exits):
        outs = []
        for i in range(0, B, bw):
            nw = min(bw, B - i)
            _, _, es_n, d_n = batch_streams(i, nw)
            outs.append(_chained_bwd_sweep_mc(
                es_n, d_n, valid_all[i : i + nw], exits[i : i + nw],
                lp_d, extra, engine=engine))
        return jnp.concatenate(outs)

    finals = fwd_sweep(None)
    entries = jnp.concatenate([zeros[:1], _recenter(finals)[:-1]])
    for _ in range(max(0, refine - 1)):
        finals = fwd_sweep(entries)
        entries = jnp.concatenate([zeros[:1], _recenter(finals)[:-1]])

    bfirsts = bwd_sweep(zeros)
    exits = jnp.concatenate([_recenter(bfirsts)[1:], zeros[:1]])
    for _ in range(max(0, refine - 1)):
        bfirsts = bwd_sweep(exits)
        exits = jnp.concatenate([_recenter(bfirsts)[1:], zeros[:1]])

    out = np.empty((T, M), np.float64)
    for i in range(0, B, bw):
        nw = min(bw, B - i)
        es_w, d_w, es_n, d_n = batch_streams(i, nw)
        if i == 0:
            g0 = np.asarray(_chained_gamma_batch_mc(
                es_w[:1], d_w[:1], es_n[:1], d_n[:1], valid_all[:1],
                zeros[:1], exits[:1], lp_d, extra, proj_d,
                engine=engine, first=True))
            out[: min(L, T)] = g0[0, : min(L, T)]
            if nw == 1:
                continue
            gb = np.asarray(_chained_gamma_batch_mc(
                es_w[1:], d_w[1:], es_n[1:], d_n[1:],
                valid_all[1:nw], entries[1:nw], exits[1:nw], lp_d,
                extra, proj_d, engine=engine, first=False))
            ks = range(1, nw)
            gb_off = 1
        else:
            gb = np.asarray(_chained_gamma_batch_mc(
                es_w, d_w, es_n, d_n, valid_all[i : i + nw],
                entries[i : i + nw], exits[i : i + nw], lp_d, extra,
                proj_d, engine=engine, first=False))
            ks = range(nw)
            gb_off = 0
        for k in ks:
            b = i + k
            s0 = b * L
            e0 = min(s0 + L, T)
            out[s0:e0] = gb[k - gb_off, : e0 - s0]
    return out


def _tracked_fallback(track, y, proj, H, exact_fn) -> np.ndarray:
    """Per-chunk haloed exact posteriors — the tracked engines' fallback
    for signals too short to window: each chunk span is evaluated by the
    exact two-pass on [s-4H, e+4H) under ITS OWN parameters and the core
    rows kept (the cold-start error at the extension edges decays
    geometrically, the windowed mode's mixing argument; a single-chunk
    track reduces to the whole-signal exact computation)."""
    T = len(y)
    Hx = 4 * H
    out = None
    for c, (s, e) in enumerate(track.bounds):
        lo = max(0, s - Hx)
        hi = min(T, e + Hx)
        p = exact_fn(track.model_at(c), y[lo:hi], proj)
        if out is None:
            out = np.empty((T, p.shape[1]), np.float64)
        out[s:e] = p[s - lo : s - lo + (e - s)]
    return out


def _window_owner(B, L, track):
    """Chunk index owning each posterior window's core, by core start.
    Exact alignment when track.chunk % L == 0 (the defaults compose:
    4096 | 32768); otherwise a window core crossing a chunk boundary is
    scored under the chunk it starts in — a < L-sample parameter offset,
    far below the tracker's own forgetting lag of ~chunk/forget
    samples."""
    return np.minimum(np.arange(B) * L // track.chunk,
                      track.n_chunks - 1)


def onset_posteriors_tracked(track, y, *, L: int = 4096,
                             H: int | None = None, proj=None,
                             batch_windows: int | None = None
                             ) -> np.ndarray:
    """Onset marginals under a drift track (train/adaptive.DriftTrack):
    the fast windowed posterior with each halo window evaluated under
    the parameters of the chunk owning its core (_window_owner) — the
    posterior mirror of decode_tracked's per-window decode. A signal too
    short for windowing falls back to per-chunk haloed exact two-passes
    (_tracked_fallback), still under each chunk's own parameters.
    """
    y = np.asarray(y)
    if y.ndim != 1:
        raise ValueError("onset_posteriors_tracked takes a (T,) trace")
    T = y.shape[0]
    if track.bounds[-1][1] != T:
        raise ValueError("track does not cover this signal "
                         f"({track.bounds[-1]} vs T={T})")
    tm_last = track.model_at(track.n_chunks - 1)
    ss = tm_last.state_space
    dtype = jnp.zeros(0).dtype
    if H is None:
        H = max(4 * track.mu.shape[1], 64)
    L = min(L, track.chunk)
    W = L + 2 * H
    B = -(-T // L)
    if H < 1 or L < 2 * H or B < 2 or T < W:
        return _tracked_fallback(
            track, y, proj, H,
            lambda tm, yy, pr: onset_posteriors(tm, yy, proj=pr))
    _check_window_f32(W, dtype)
    if proj is None and _pallas_gamma_ov2_ok(tm_last, dtype):
        # fused chained kernels with PER-LANE parameters: the EXACT
        # piecewise-parameter forward-backward (each disjoint L-window
        # under its owning chunk's adapted templates; no halo
        # approximation)
        from ..ops.pallas_gamma_ov2 import (CH2, ov2_gamma_hbm_ok,
                                            onset_gammas_pallas_ov2_tracked)

        if L % CH2 == 0 and ov2_gamma_hbm_ok(T, L):
            owner = _window_owner(B, L, track)
            return onset_gammas_pallas_ov2_tracked(
                np.asarray(y, np.float32), track.lp[owner],
                track.mu[owner], track.sigma[owner], L=L)
    if proj is None:
        proj = onset_projection(ss.states)
    proj_d = jnp.asarray(proj, dtype)

    owner = _window_owner(B, L, track)
    return _windowed_sc_run(
        y, T=T, L=L, H=H, B=B, W=W, proj_d=proj_d,
        batch_windows=batch_windows,
        lp_all=jnp.asarray(track.lp[owner], dtype),
        mu_all=jnp.asarray(track.mu[owner], dtype),
        sg_all=jnp.asarray(track.sigma[owner], dtype),
        engine=_sc_engine_name(tm_last), dtype=dtype)


def _ring_fb_block_fn_mc(templates):
    """MC mirror of _ring_fb_block_fn (structural engines cover every
    topology; the dense-emission gather FB remains the test oracle)."""
    return _MC_FB[_sc_engine_name(templates)]


def _mc_extra_tables(engine: str, tables, dtype):
    """The engine's static energy-table tuple (shared by the exact and
    windowed MC drivers)."""
    c1 = jnp.asarray(tables.c1, dtype)
    if engine == "nov":
        return (c1,)
    if engine == "ov2":
        return (c1, jnp.asarray(tables.x2[(0, 1)], dtype))
    return (c1, jnp.asarray(
        np.stack([tables.c2[p] for p in sorted(tables.c2)]), dtype))


def onset_posteriors_mc(templates, yc, *, block: int = 8192,
                        proj=None) -> np.ndarray:
    """Multi-channel onset marginals: (T, N) posterior that neuron n
    onsets at t under the joint (T, C) model (models/multichannel
    HMMTemplateModelMC). Same two-pass blocked algorithm as
    onset_posteriors, over the factorized channel streams
    (core/emission_mc.mc_streams). The streams are pointwise in t, so
    they are computed per block from the yc slice (one small
    (block, C) x (C, N*(K-1)) matmul per pass) — memory stays
    O(block * S) instead of holding a (T, N, K-1) stream tensor live."""
    from .emission_mc import MCTables, mc_streams

    yc = np.asarray(yc)
    if yc.ndim != 2:
        raise ValueError("onset_posteriors_mc takes a (T, C) recording")
    ss = templates.state_space
    dtype = jnp.zeros(0).dtype
    if proj is None:
        proj = onset_projection(ss.states)
    proj = jnp.asarray(proj, dtype)
    T = yc.shape[0]
    S = ss.nstates
    block = max(2, min(block, T))

    tables = MCTables(templates.mu, templates.sigmas)
    yc_d = jnp.asarray(yc, dtype)
    lp_d = jnp.asarray(templates.lp, dtype)
    fbfn = _ring_fb_block_fn_mc(templates)
    extra = _mc_extra_tables(_sc_engine_name(templates), tables, dtype)

    def run(carry, lo, hi, first, reverse):
        es_blk, d_blk = mc_streams(yc_d[lo:hi], tables, dtype=dtype)
        return fbfn(carry, es_blk, d_blk, lp_d, *extra,
                    first=first, reverse=reverse)

    return _two_pass(run, T, S, block, proj, dtype)


_MC_FB = {"nov": _nov_fb_block_mc, "ov2": _ov2_fb_block_mc,
          "ovn": _ovn_fb_block_mc}


@partial(jax.jit, static_argnames=("engine",))
def _windowed_gamma_mc(es_win, d_win, lp, tables, proj, *, engine: str):
    """MC mirror of _windowed_gamma_sc over the factorized stream
    windows; `tables` is the engine's static energy-table tuple."""
    fb = _MC_FB[engine]
    S = proj.shape[0]
    dtype = es_win.dtype

    def one(ew, dw):
        _, a_all = fb(jnp.zeros((S,), dtype), ew, dw, lp, *tables,
                      first=True, reverse=False)
        _, b_rest = fb(jnp.zeros((S,), dtype), ew[1:], dw[1:], lp,
                       *tables, first=False, reverse=True)
        b_all = jnp.concatenate([b_rest, jnp.zeros((1, S), dtype)], axis=0)
        g = a_all + b_all
        g = g - logsumexp_rows(g, axis=1)[:, None]
        return jnp.matmul(jnp.exp(g), proj,
                          precision=jax.lax.Precision.HIGHEST)

    return jax.vmap(one)(es_win, d_win)


def onset_posteriors_windowed_mc(templates, yc, *, L: int = 4096,
                                 H: int | None = None, proj=None,
                                 batch_windows: int | None = None
                                 ) -> np.ndarray:
    """Multi-channel mirror of onset_posteriors_windowed: the joint
    (T, C) recording's halo windows processed in parallel over the
    factorized channel streams (computed per window batch — streams are
    pointwise in t, so windowing commutes with the projection)."""
    from ..parallel.overlap_save import _build_windows_arrays
    from .emission_mc import MCTables, mc_streams

    yc = np.asarray(yc)
    if yc.ndim != 2:
        raise ValueError("onset_posteriors_windowed_mc takes (T, C)")
    ss = templates.state_space
    dtype = jnp.zeros(0).dtype
    if H is None:
        H = max(4 * templates.K, 64)
    T, C = yc.shape
    W = L + 2 * H
    B = -(-T // L)
    if H < 1 or L < 2 * H or B < 2 or T < W:
        return onset_posteriors_mc(templates, yc, proj=proj)
    _check_window_f32(W, dtype)
    if proj is None:
        proj = onset_projection(ss.states)
    proj_d = jnp.asarray(proj, dtype)
    S = ss.nstates
    M = proj_d.shape[1]

    tables = MCTables(templates.mu, templates.sigmas)
    lp_d = jnp.asarray(templates.lp, dtype)
    engine = _sc_engine_name(templates)
    extra = _mc_extra_tables(engine, tables, dtype)

    # halo windows of the raw channels: (C, B, W) -> (B, W, C)
    yw = jax.vmap(partial(_build_windows_arrays, T=T, L=L, H=H, B=B,
                          W=W))(jnp.asarray(yc.T, dtype))
    yw = jnp.transpose(yw, (1, 2, 0))
    starts = _window_starts(T, L, H, B, W)
    if batch_windows is None:
        batch_windows = max(1, int(2e9 // (2 * W * S * 4)))
    batch_windows = min(batch_windows, B)   # never pad past the real work

    out = np.empty((T, M), np.float64)
    for i in range(0, B, batch_windows):
        nw = min(batch_windows, B - i)
        yb = yw[i:i + nw]
        if nw < batch_windows:
            yb = jnp.concatenate(
                [yb, jnp.zeros((batch_windows - nw, W, C), yb.dtype)])
        es_w, d_w = mc_streams(yb, tables, dtype=dtype)
        gb = np.asarray(_windowed_gamma_mc(es_w, d_w, lp_d, extra,
                                           proj_d, engine=engine))
        for k in range(nw):
            b = i + k
            s0 = b * L
            e0 = T if b == B - 1 else s0 + L
            lo = s0 - starts[b]
            out[s0:e0] = gb[k, lo:lo + (e0 - s0)]
    return out


def _mc_extra_tables_device(engine: str, tb):
    """The engine's energy-table tuple from in-graph tables
    (emission_mc.MCTablesDevice) — the tracer mirror of
    _mc_extra_tables."""
    if engine == "nov":
        return (tb.c1,)
    if engine == "ov2":
        return (tb.c1, tb.x2_01)
    return (tb.c1, tb.c2_stack)


@partial(jax.jit, static_argnames=("engine",))
def _windowed_gamma_mc_tracked(y_win, lp_w, mu_w, sg_w, proj, *,
                               engine: str):
    """MC windowed gamma with PER-WINDOW parameters: streams and energy
    tables are computed in-graph per window (emission_mc.MCTablesDevice)
    from each window's adapted (lp, mu (K, N, C), sigmas (C,)) — the
    posterior mirror of the drift-tracked decode."""
    from .emission_mc import MCTablesDevice, mc_streams

    fb = _MC_FB[engine]
    S = proj.shape[0]
    dtype = mu_w.dtype

    def one(yw, lp, mu, sg):
        tb = MCTablesDevice(mu, sg, dtype)
        ew, dw = mc_streams(yw, tb, dtype=dtype)
        tabs = _mc_extra_tables_device(engine, tb)
        _, a_all = fb(jnp.zeros((S,), dtype), ew, dw, lp, *tabs,
                      first=True, reverse=False)
        _, b_rest = fb(jnp.zeros((S,), dtype), ew[1:], dw[1:], lp,
                       *tabs, first=False, reverse=True)
        b_all = jnp.concatenate([b_rest, jnp.zeros((1, S), dtype)], axis=0)
        g = a_all + b_all
        g = g - logsumexp_rows(g, axis=1)[:, None]
        return jnp.matmul(jnp.exp(g), proj,
                          precision=jax.lax.Precision.HIGHEST)

    return jax.vmap(one)(y_win, lp_w, mu_w, sg_w)


def onset_posteriors_tracked_mc(track, yc, *, L: int = 4096,
                                H: int | None = None, proj=None,
                                batch_windows: int | None = None
                                ) -> np.ndarray:
    """MC onset marginals under a drift track — the multi-channel mirror
    of onset_posteriors_tracked (each halo window evaluated under the
    chunk parameters owning its core, _window_owner; signals too short
    to window fall back to per-chunk haloed exact two-passes)."""
    from ..parallel.overlap_save import _build_windows_arrays

    yc = np.asarray(yc)
    if yc.ndim != 2:
        raise ValueError("onset_posteriors_tracked_mc takes (T, C)")
    T, C = yc.shape
    if track.bounds[-1][1] != T:
        raise ValueError("track does not cover this signal "
                         f"({track.bounds[-1]} vs T={T})")
    tm_last = track.model_at(track.n_chunks - 1)
    ss = tm_last.state_space
    dtype = jnp.zeros(0).dtype
    if H is None:
        H = max(4 * track.mu.shape[1], 64)
    L = min(L, track.chunk)
    W = L + 2 * H
    B = -(-T // L)
    if H < 1 or L < 2 * H or B < 2 or T < W:
        return _tracked_fallback(
            track, yc, proj, H,
            lambda tm, yy, pr: onset_posteriors_mc(tm, yy, proj=pr))
    _check_window_f32(W, dtype)
    if proj is None:
        proj = onset_projection(ss.states)
    proj_d = jnp.asarray(proj, dtype)
    S = ss.nstates
    M = proj_d.shape[1]
    engine = _sc_engine_name(tm_last)

    owner = _window_owner(B, L, track)
    lp_all = jnp.asarray(track.lp[owner], dtype)
    mu_all = jnp.asarray(track.mu[owner], dtype)
    sg_all = jnp.asarray(track.sigma[owner], dtype)

    yw = jax.vmap(partial(_build_windows_arrays, T=T, L=L, H=H, B=B,
                          W=W))(jnp.asarray(yc.T, dtype))
    yw = jnp.transpose(yw, (1, 2, 0))                    # (B, W, C)
    starts = _window_starts(T, L, H, B, W)
    if batch_windows is None:
        batch_windows = max(1, int(2e9 // (2 * W * S * 4)))
    batch_windows = min(batch_windows, B)

    out = np.empty((T, M), np.float64)
    for i in range(0, B, batch_windows):
        nw = min(batch_windows, B - i)
        yb = yw[i:i + nw]
        lpb = lp_all[i:i + nw]
        mub = mu_all[i:i + nw]
        sgb = sg_all[i:i + nw]
        if nw < batch_windows:
            pad = batch_windows - nw
            lp_fill = float(np.log(0.5 / max(lpb.shape[-1], 1)))
            yb = jnp.concatenate([yb, jnp.zeros((pad, W, C), yb.dtype)])
            lpb = jnp.concatenate(
                [lpb, jnp.full((pad,) + lpb.shape[1:], lp_fill,
                               lpb.dtype)])
            mub = jnp.concatenate(
                [mub, jnp.zeros((pad,) + mub.shape[1:], mub.dtype)])
            sgb = jnp.concatenate(
                [sgb, jnp.ones((pad,) + sgb.shape[1:], sgb.dtype)])
        gb = np.asarray(_windowed_gamma_mc_tracked(yb, lpb, mub, sgb,
                                                   proj_d, engine=engine))
        for k in range(nw):
            b = i + k
            s0 = b * L
            e0 = T if b == B - 1 else s0 + L
            lo = s0 - starts[b]
            out[s0:e0] = gb[k, lo:lo + (e0 - s0)]
    return out


def model_posteriors(model, *, block: int = 8192,
                     windowed: bool = False) -> np.ndarray:
    """(T, N) onset posteriors for a decoded model, routed by model
    type: drift-decoded models (carrying `.track`) go through the
    tracked windowed posteriors; multi-channel models through the MC
    engines. The stationary default is EXACT at any length — long
    recordings route to the chained parallel two-pass
    (onset_posteriors_chained[_mc], same accuracy as the sequential
    exact path, window-parallel speed); `windowed=True` opts into the
    cheaper halo-window approximation (mixing-limited accuracy — see
    onset_posteriors_windowed). spike_confidence and core/qc consume
    this."""
    tm = model.template_model
    y = np.asarray(model.y)
    T = y.shape[0]
    long = T >= 8192
    track = getattr(model, "track", None)
    if track is not None:
        return (onset_posteriors_tracked_mc(track, y) if y.ndim == 2
                else onset_posteriors_tracked(track, y))
    if y.ndim == 2:
        if windowed:
            return onset_posteriors_windowed_mc(tm, y)
        return (onset_posteriors_chained_mc(tm, y) if long
                else onset_posteriors_mc(tm, y, block=block))
    if windowed:
        return onset_posteriors_windowed(tm, y)
    return (onset_posteriors_chained(tm, y) if long
            else onset_posteriors(tm, y, block=block))


def confidence_from_posteriors(p: np.ndarray, onsets,
                               *, half_width: int) -> list:
    """Per-spike posterior-mass scores from a precomputed (T, N) onset
    posterior grid: for each decoded onset t0 of neuron n, the sum of
    p[:, n] within half_width samples (see spike_confidence)."""
    T = p.shape[0]
    w = int(half_width)
    out = []
    for n in range(p.shape[1]):
        cs = np.concatenate([[0.0], np.cumsum(p[:, n])])
        pos = np.asarray(onsets[n], np.int64)
        lo = np.clip(pos - w, 0, T)
        hi = np.clip(pos + w + 1, 0, T)
        out.append(cs[hi] - cs[lo])
    return out


def spike_confidence(model, *, half_width: int | None = None,
                     block: int = 8192, windowed: bool = False):
    """Posterior support for each decoded spike.

    For every decoded onset t0 of neuron n (model.spike_onsets when the
    decode used transfer="events", else recovered from the labels), the
    confidence is the posterior onset mass sum_{|t-t0| <= w} P(neuron n
    onsets at t) — how much of the forward-backward probability actually
    backs the MAP decision. w defaults to (K-1)//2, the widest window
    that can never cover two same-neuron onsets (they are >= K apart).

    Returns a list of N float arrays aligned with the onset lists. The
    value is a posterior MASS, not a probability: stray onset mass inside
    the window (e.g. sub-threshold posterior bumps the MAP rejected) can
    push a clean spike's score slightly past 1.

    Works on single-channel and multi-channel decodes (the model's
    stored signal dimensionality selects the engine). A drift-decoded
    model (train/adaptive.decode_tracked — it carries `.track`) scores
    each spike under the chunk parameters that decoded it
    (onset_posteriors_tracked), in windowed mode regardless of the flag:
    the last-chunk templates alone would mis-score early spikes.
    """
    tm = model.template_model
    K = tm.K
    N = tm.n_neurons
    w = (K - 1) // 2 if half_width is None else int(half_width)
    onsets = getattr(model, "spike_onsets", None)
    if onsets is None:
        from .events import _onsets_dense

        onsets = _onsets_dense(np.asarray(model.ml_seq), N=N, K=K,
                               overlaps=tm.allow_overlaps)
    p = model_posteriors(model, block=block, windowed=windowed)
    return confidence_from_posteriors(p, onsets, half_width=w)
