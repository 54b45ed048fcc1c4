"""Literal NumPy transcription of the *semantics* of the reference Julia
implementation (grero/HMMSpikeSorter.jl), kept purely as a test oracle.

NOT product code: intentionally slow, loop-for-loop faithful to the reference
including its quirks (dead-pi init, forced silent start, strict-> tie-break,
cumulative-score ll definition, per-silent-neuron lpz weighting), so the TPU
framework can be bit-compared against reference behavior without a Julia
runtime. Each function cites the reference file:line it mirrors.

All indices are 0-based here; the reference is 1-based (reference state 1 ==
oracle state 0).
"""

from __future__ import annotations

import numpy as np

LOG2PI = 0.5 * np.log(2 * np.pi)  # reference src/utils.jl:1 (it is 0.5*log(2pi))


def funcl(x, mu, sigma):
    """Gaussian log-pdf — reference src/utils.jl:3."""
    s2 = sigma * sigma
    d = x - mu
    return -LOG2PI - np.log(sigma) - d * d / (2 * s2)


def logsumexpl(a, b):
    """Pairwise stable log-add — reference src/utils.jl:24-32."""
    if a > b:
        return a + np.log1p(np.exp(b - a))
    if np.isinf(b) and b < 0:
        return b
    return b + np.log1p(np.exp(a - b))


def generate_states(N, K, allow_overlaps=True):
    """reference src/types.jl:65-92 — (N, nstates) int, 0-based positions."""
    if allow_overlaps:
        n = 1 + N * (K - 1) + N * (N - 1) * (K - 1) * (K - 1) // 2
    else:
        n = 1 + N * (K - 1)
    states = np.zeros((N, n), dtype=np.int64)
    k = 1
    for i in range(N):
        for k1 in range(1, K):
            states[i, k] = k1
            k += 1
    if allow_overlaps:
        for i in range(N - 1):
            for j in range(i + 1, N):
                for k1 in range(1, K):
                    for k2 in range(1, K):
                        states[i, k] = k1
                        states[j, k] = k2
                        k += 1
    return states


def isvalid_transition(states, K, lp, j1, j2):
    """reference src/types.jl:94-113."""
    lpt = 0.0
    lpz = np.log1p(-np.exp(np.sum(lp)))
    for i in range(states.shape[0]):
        s1, s2 = states[i, j1], states[i, j2]
        if s1 == s2 == 0:
            lpt += lpz
        elif s1 == 0 and s2 == 1:
            lpt += lp[i]
        elif (s2 - s1 == 1) or (s1 == K - 1 and s2 == 0):
            lpt += 0.0
        else:
            return -np.inf
    return lpt


def get_valid_transitions(states, K, lp):
    """reference src/types.jl:115-127 — list of (from, to, logp)."""
    out = []
    S = states.shape[1]
    for i in range(S):
        for j in range(S):
            a = isvalid_transition(states, K, lp, i, j)
            if np.isfinite(a):
                out.append((i, j, a))
    return out


def state_means(states, mu):
    """Per-state additive template superposition — reference
    src/baumwelch.jl:30-37 (mu is (K, N); silent neurons index row 0)."""
    N, S = states.shape
    _mu = np.zeros(S)
    for i in range(S):
        for j in range(N):
            _mu[i] += mu[states[j, i], j]
    return _mu


def viterbi(y, states, transitions, mu, sigma):
    """reference src/viterbi.jl:44-98 (StateMatrix dispatch), including:
    - dead-pi init: T1[:,0] = emission only (viterbi.jl:56-61),
    - forced silent start T1[0,0] = 0 (viterbi.jl:63),
    - strict > keeps the first maximal in edge-list order (viterbi.jl:74-84),
    - ll = sum over i=T-1..1 of T1[x[i], i] (viterbi.jl:92-96).
    Returns (x int array, ll).
    """
    lsig = np.log(sigma)
    S = states.shape[1]
    T = len(y)
    _mu = state_means(states, mu)
    T1 = np.full((S, T), -np.inf)
    T2 = np.zeros((S, T), dtype=np.int64)  # reference inits to state 1 (==0)
    s2 = sigma * sigma
    T1[:, 0] = -LOG2PI - lsig - (y[0] - _mu) ** 2 / (2 * s2)
    T1[0, 0] = 0.0
    for i in range(1, T):
        q = -LOG2PI - lsig - (y[i] - _mu) ** 2 / (2 * s2)
        for (k, j, lp) in transitions:
            t = T1[k, i - 1] + lp
            if t > T1[j, i]:
                T1[j, i] = t
                T2[j, i] = k
        T1[:, i] += q
    x = np.zeros(T, dtype=np.int64)
    x[T - 1] = int(np.argmax(T1[:, T - 1]))
    ll = 0.0
    for i in range(T - 1, 0, -1):
        x[i - 1] = T2[x[i], i]
        ll += T1[x[i], i]
    return x, ll


def forward(V, states, transitions, mu, sigma):
    """reference src/baumwelch.jl:25-51 (StateMatrix dispatch, dead-pi)."""
    S = states.shape[1]
    T = len(V)
    _mu = state_means(states, mu)
    a = np.full((S, T), -np.inf)
    for i in range(S):
        a[i, 0] = funcl(V[0], _mu[i], sigma)
    for i in range(1, T):
        v = V[i]
        for (k, j, lp) in transitions:
            b = funcl(v, _mu[j], sigma)
            a[j, i] = logsumexpl(a[j, i], a[k, i - 1] + lp + b)
    return a


def backward(V, states, transitions, mu, sigma):
    """reference src/baumwelch.jl:73-98."""
    S = states.shape[1]
    T = len(V)
    _mu = state_means(states, mu)
    a = np.full((S, T), -np.inf)
    a[:, T - 1] = 0.0
    for i in range(T - 2, -1, -1):
        v = V[i + 1]
        for (j, k, lp) in transitions:
            b = funcl(v, _mu[k], sigma)
            a[j, i] = logsumexpl(a[j, i], a[k, i + 1] + lp + b)
    return a


def em_update(alpha, beta, states, transitions, K, mu, sigma, x,
              resolve_overlaps=False):
    """reference src/baumwelch.jl:205-309 ("KIND OF WORKS" update).

    Returns (new_lp, new_pi, new_mu, new_sigma): the reference returns a
    rebuilt StateMatrix; the new edge weights are fully determined by
    new_lp = xb[1:] (reference baumwelch.jl:264-265 drops the silent
    self-loop entry xb[0]).
    """
    S = states.shape[1]
    N = states.shape[0]
    T = len(x)
    _mu = state_means(states, mu)
    g = np.zeros(T)
    ab = alpha + beta
    for t in range(T):
        m = ab[:, t].max()
        g[t] = m + np.log(np.sum(np.exp(ab[:, t] - m)))
    gamma = ab - g[None, :]

    tidx = [i for i, q in enumerate(transitions) if q[0] == 0]
    xi = np.zeros((len(tidx), T - 1))
    for t in range(T - 1):
        _x = x[t + 1]
        b_all = funcl(_x, _mu, sigma)
        for i, ti in enumerate(tidx):
            j = transitions[ti][1]
            lp = transitions[ti][2]
            xi[i, t] = alpha[0, t] + lp + beta[j, t + 1] + b_all[j]
        q = -np.inf
        for (i, j, lp) in transitions:
            q = logsumexpl(q, alpha[i, t] + lp + beta[j, t + 1] + b_all[j])
        xi[:, t] -= q

    # xb = logsumexp_t xi - logsumexp_t gamma[0] (baumwelch.jl:254-264)
    def lse(v):
        m = v.max()
        return m + np.log(np.sum(np.exp(v - m)))

    bb = lse(gamma[0, : T - 1])
    xx = np.array([lse(xi[j]) for j in range(xi.shape[0])])
    new_pi = gamma[:, 0].copy()
    xb = xx - bb
    new_lp = xb[1:]  # drop silent self-loop (assumes non-overlap space)

    # mu update over single-active states (baumwelch.jl:266-287)
    new_mu = np.zeros_like(mu)
    gg = np.zeros_like(mu)
    sidx = np.nonzero((states > 0).sum(axis=0) == 1)[0]
    for t in range(T):
        _x = x[t]
        for j in sidx:
            e = np.exp(gamma[j, t])
            for l in range(N):
                ss = states[l, j]
                if ss > 0:
                    new_mu[ss, l] += _x * e
                    gg[ss, l] += e
    for l in range(N):
        for j in range(1, K):
            new_mu[j, l] /= gg[j, l]

    _mu2 = state_means(states, new_mu)
    x2 = 0.0
    qq = 0.0
    for t in range(T):
        e = np.exp(gamma[:, t])
        d = x[t] - _mu2
        x2 += np.sum(d * d * e)
        qq += np.sum(e)
    new_sigma = np.sqrt(x2 / qq)
    return new_lp, new_pi, new_mu, new_sigma


def reconstruct_signal(x, states, mu):
    """reference src/reconstruction.jl:1-9."""
    T = len(x)
    Y = np.zeros(T)
    for i in range(T):
        for j in range(states.shape[0]):
            Y[i] += mu[states[j, x[i]], j]
    return Y


def unroll_mlseq(mlseq, states):
    """reference src/extraction.jl:4-13 (0-based state indices in, 0-based
    ring positions out)."""
    N = states.shape[0]
    out = np.zeros((N, len(mlseq)), dtype=np.int64)
    for i, mi in enumerate(mlseq):
        out[:, i] = states[:, mi]
    return out
