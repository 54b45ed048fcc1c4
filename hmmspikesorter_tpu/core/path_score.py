"""Cumulative path score ("ll") for a decoded state sequence, in O(T).

The reference's Viterbi returns ll = sum over t=1..T-1 of T1[x_t, t] — the
running best-score read along the decoded path (src/viterbi.jl:92-96; the
sum excludes t=0). Computing T1 columns normally needs the full max-plus
recursion (O(T*S), and O(T*S^2) block operators to parallelize — infeasible
at S ~ 10^4 overlap spaces). But along a *backtrace-produced* path the
recursion telescopes exactly:

    T1[x_t, t] = T1[T2[x_t,t], t-1] + w(T2 -> x_t) + em(y_t | x_t)

and the backtrace sets x_{t-1} = T2[x_t, t], so

    T1[x_t, t] = T1[x_0, 0] + sum_{tau<=t} [w(x_{tau-1} -> x_tau) + em_tau].

Every increment is local to the path: ll is a cumulative sum of per-sample
transition + emission terms — O(T) elementwise work, any topology, no state
vectors at all. Equality with the reference's ll holds whenever `x` is the
decode path of the whole-signal recursion (ties included: the max value
equals the value through the chosen argmax predecessor).

Contract for the parallel overlap-save decode (parallel/overlap_save.py):
its stitched path follows block-local argmax segments joined at
common-silence seams, where the splice transition coincides with the left
block's own (valid) transition into silence — so the path is globally
valid and this function returns its exact cumulative score, which equals
the sequential engine's ll whenever the labels agree (the tested, typical
case). An unrepaired raw seam (seam_ok=False) can make the path invalid;
the score is then -inf — an honest signal, not a crash.

Transition weights follow reference src/types.jl:94-113: per neuron,
silent->silent contributes lpz = log1p(-exp(sum(lp))) (so the all-silent
self-loop gets N*lpz — the reference's deliberate approximation), onset
contributes lp[i], deterministic ring moves contribute 0.
"""

from __future__ import annotations

import numpy as np

from ..utils.logmath import HALF_LOG_2PI


def path_transition_weights(pos_from, pos_to, lp, K: int) -> np.ndarray:
    """Per-step transition log-weights along a path.

    pos_from/pos_to: (N, M) per-neuron ring positions (0 = silent) of the
    source and target combined states of M consecutive transitions.
    Returns (M,) summed per-neuron weights (-inf where a move is invalid).
    """
    lp = np.asarray(lp, np.float64)
    # N == 0: no onsets exist, the silent self-loop has probability 1
    lpz = np.log1p(-np.exp(lp.sum())) if lp.size else 0.0
    p, q = pos_from, pos_to
    stay = (p == 0) & (q == 0)
    onset = (p == 0) & (q == 1)
    ring = ((q == p + 1) & (p >= 1)) | ((p == K - 1) & (q == 0))
    w = np.where(stay, lpz, 0.0) + np.where(onset, lp[:, None], 0.0)
    invalid = ~(stay | onset | ring)
    w = np.where(invalid, -np.inf, w)
    return w.sum(axis=0)


def _telescoped_score(em, x, states, lp, K, silent_start) -> float:
    """Shared tail of the single- and multi-channel scores: the prefix
    cumsum of per-step transition + emission increments over path `x`,
    given the per-sample path emissions `em` (T,). Changes to the ll
    contract (silent_start, T == 1 semantics) live in exactly one place."""
    T = len(em)
    if T == 0:
        return 0.0
    prefix0 = 0.0 if (silent_start and x[0] == 0) else float(em[0])
    if T == 1:
        return 0.0                                        # sum over t>=1 empty

    pos = states[:, x]                                    # (N, T)
    w = path_transition_weights(pos[:, :-1], pos[:, 1:], lp, K)  # (T-1,)
    prefix = prefix0 + np.cumsum(w + em[1:])              # T1[x_t,t], t>=1
    return float(prefix.sum())


def path_cumulative_ll(y, x, states, mu, sigma, lp, *,
                       silent_start: bool = True) -> float:
    """Reference cumulative-score ll of path `x` (viterbi.jl:92-96), O(T).

    y: (T,) observations; x: (T,) decoded combined-state indices (0-based);
    states: (N, S) per-neuron ring-position table (core/state_space.py);
    mu: (K, N) templates; sigma: noise std; lp: (N,) onset log-probs.

    silent_start mirrors the reference's forced T1[0,0] = 0 (viterbi.jl:63):
    the t=0 prefix is 0 when the path starts silent, else its emission.
    """
    y = np.asarray(y, np.float64)
    x = np.asarray(x, np.int64)
    states = np.asarray(states)
    mu = np.asarray(mu, np.float64)
    K, N = mu.shape

    smu = mu[states, np.arange(N)[:, None]].sum(axis=0)   # (S,) state means
    sigma = float(sigma)
    em = (-HALF_LOG_2PI - np.log(sigma)
          - (y - smu[x]) ** 2 / (2.0 * sigma * sigma))    # (T,)
    return _telescoped_score(em, x, states, lp, K, silent_start)


def path_cumulative_ll_mc(yc, x, states, mu, sigmas, lp, *,
                          silent_start: bool = True) -> float:
    """Multi-channel variant of path_cumulative_ll: the same telescoped
    O(T) score with the emission replaced by the per-channel Gaussian sum
    (core/emission_mc.py). yc: (T, C); mu: (K, N, C); sigmas: (C,)."""
    yc = np.asarray(yc, np.float64)
    x = np.asarray(x, np.int64)
    states = np.asarray(states)
    mu = np.asarray(mu, np.float64)
    sigmas = np.asarray(sigmas, np.float64)
    K, N, C = mu.shape

    smu = mu[states, np.arange(N)[:, None]].sum(axis=0)   # (S, C)
    d = yc - smu[x]                                       # (T, C)
    em = np.sum(-HALF_LOG_2PI - np.log(sigmas)
                - d * d / (2.0 * sigmas * sigmas), axis=1)  # (T,)
    return _telescoped_score(em, x, states, lp, K, silent_start)
