"""Ring-structured forward/backward (non-overlap space): gather-free EM scans.

Log-plus mirror of ops/ring_viterbi.py — the transition structure is
per-neuron {stay-silent, onset, ring shift, ring exit, exit+onset handoff},
so each recursion step is slices + logaddexp on (N, K-1) tensors instead of
an in-edge gather (which XLA lowers to slow scalar loops on TPU). Output
layout is the flat state indexing of core/state_space.py
([silent | body ravel]), so the EM statistic reductions (train/em.py)
consume it unchanged.

Two execution schemes over the same step function:

* `ring_forward` / `ring_backward` — plain T-step sequential scans (lowest
  FLOPs; right for CPU, latency-bound on TPU);
* `ring_blocked_forward_backward` — the parallel-prefix scheme
  (cf. arXiv:2102.05743): per-block (S, S) log-plus operators built by
  running the *same ring step* vmapped over S identity source rows — every
  block in parallel, no gathers anywhere — then a B-step boundary matvec
  chain and a parallel per-block interior recompute. ~S x more FLOPs,
  B-way parallel: the TPU scheme.

Semantics: reference src/baumwelch.jl:25-51 (dead-pi emission-only init)
and :73-98 (beta[T-1] = 0); matches the gather engine to ~1e-11 (tested).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.logmath import HALF_LOG_2PI, logsumexp_rows


def _weights(lp, dtype):
    N = lp.shape[0]
    lpz = jnp.log1p(-jnp.exp(jnp.sum(lp)))
    return dict(
        onset_w=lp + (N - 1) * lpz,
        self_w=N * lpz,
        stay_w=(N - 1) * lpz,
        swap_w=(N - 2) * lpz,
        lp=lp,
        diag_mask=jnp.where(jnp.eye(N, dtype=bool), -jnp.inf,
                            0.0).astype(dtype),
    )


def _emission_fns(mu, sigma):
    dtype = mu.dtype
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

    return em


def _fwd_step(vs, vb, es, ebm, w):
    """One forward log-plus update; vs scalar-like, vb (..., N, K-1).

    Supports a leading batch axis on vs/vb (the operator builder vmaps over
    source rows); es/ebm broadcast.
    """
    ends = vb[..., :, -1]                                   # (..., N)
    new_vs = jnp.logaddexp(
        vs + w["self_w"],
        jax.nn.logsumexp(ends + w["stay_w"], axis=-1)) + es
    # onset slot (n,1): from silent, or another neuron's same-step exit
    swap = jax.nn.logsumexp(
        ends[..., :, None] + w["diag_mask"], axis=-2) + w["swap_w"]
    first = jnp.logaddexp(vs[..., None] + w["onset_w"], swap + w["lp"])
    new_vb = jnp.concatenate(
        [first[..., :, None], vb[..., :, :-1] + w["stay_w"]], axis=-1) + ebm
    return new_vs, new_vb


def _bwd_step(bs, bb, es, ebm, w):
    """One backward log-plus update (es/ebm are the t+1 emissions)."""
    N = bb.shape[-2]
    onset_terms = bb[..., :, 0] + ebm[..., :, 0] + w["onset_w"]   # (..., N)
    new_bs = jnp.logaddexp(bs + es + w["self_w"],
                           jax.nn.logsumexp(onset_terms, axis=-1))
    shifted = bb[..., :, 1:] + ebm[..., :, 1:] + w["stay_w"]
    handoff = bb[..., :, 0] + ebm[..., :, 0] + w["lp"]            # targets
    exit_each = jax.nn.logsumexp(
        handoff[..., None, :] + w["diag_mask"], axis=-1) + w["swap_w"]
    exit_term = jnp.logaddexp(
        jnp.broadcast_to((bs + es)[..., None] + w["stay_w"], exit_each.shape),
        exit_each)
    new_bb = jnp.concatenate([shifted, exit_term[..., :, None]], axis=-1)
    return new_bs, new_bb


def _flat(vs, vb):
    """[silent | body ravel] along the last axes."""
    return jnp.concatenate(
        [vs[..., None], vb.reshape(*vb.shape[:-2], -1)], axis=-1)


def _unflat(v, N, Km1):
    return v[..., 0], v[..., 1:].reshape(*v.shape[:-1], N, Km1)


@jax.jit
def ring_forward(y, lp, mu, sigma):
    """(T, S) forward log-scores, flat state layout (sequential scan)."""
    dtype = mu.dtype
    y = y.astype(dtype)
    lp = jnp.asarray(lp, dtype)
    w = _weights(lp, dtype)
    em = _emission_fns(mu, sigma)

    es0, eb0 = em(y[0])

    def step(carry, y_t):
        vs, vb = carry
        es, ebm = em(y_t)
        vs, vb = _fwd_step(vs, vb, es, ebm, w)
        return (vs, vb), _flat(vs, vb)

    _, rest = jax.lax.scan(step, (es0, eb0), y[1:])
    return jnp.concatenate([_flat(es0, eb0)[None], rest], axis=0)


@jax.jit
def ring_backward(y, lp, mu, sigma):
    """(T, S) backward log-scores, flat state layout (sequential scan)."""
    dtype = mu.dtype
    y = y.astype(dtype)
    K, N = mu.shape
    lp = jnp.asarray(lp, dtype)
    w = _weights(lp, dtype)
    em = _emission_fns(mu, sigma)

    bs = jnp.asarray(0.0, dtype)
    bb = jnp.zeros((N, K - 1), dtype)

    def step(carry, y_next):
        bs, bb = carry
        es, ebm = em(y_next)
        bs, bb = _bwd_step(bs, bb, es, ebm, w)
        return (bs, bb), _flat(bs, bb)

    _, rest = jax.lax.scan(step, (bs, bb), y[1:], reverse=True)
    return jnp.concatenate([rest, _flat(bs, bb)[None]], axis=0)


@partial(jax.jit, static_argnames=("L",))
def ring_blocked_forward_backward(y, lp, mu, sigma, *, L: int = 256):
    """(T, S) alpha and beta via gather-free parallel-prefix over time
    blocks. Pads T-1 transition steps to a multiple of L internally."""
    dtype = mu.dtype
    y = y.astype(dtype)
    T = y.shape[0]
    K, N = mu.shape
    Km1 = K - 1
    S = 1 + N * Km1
    lp = jnp.asarray(lp, dtype)
    w = _weights(lp, dtype)
    em = _emission_fns(mu, sigma)

    Tm1 = T - 1
    B = -(-Tm1 // L)
    pad = B * L - Tm1
    y_steps = jnp.pad(y[1:], (0, pad)).reshape(B, L)
    mask = (jnp.arange(B * L) < Tm1).reshape(B, L)

    eyeS = jnp.where(jnp.eye(S, dtype=bool), 0.0, -jnp.inf).astype(dtype)

    def fwd_operator(y_blk, m_blk):
        """(S, S) log-plus operator: ring step vmapped over source rows."""
        VS, VB = _unflat(eyeS, N, Km1)        # (S,), (S, N, Km1)

        def stp(c, inp):
            vs, vb = c
            y_t, valid = inp
            es, ebm = em(y_t)
            nvs, nvb = _fwd_step(vs, vb, es, ebm, w)
            vs = jnp.where(valid, nvs, vs)
            vb = jnp.where(valid, nvb, vb)
            return (vs, vb), None

        (VS, VB), _ = jax.lax.scan(stp, (VS, VB), (y_blk, m_blk))
        return _flat(VS, VB)                  # (S, S): row = source

    ops = jax.vmap(fwd_operator)(y_steps, mask)            # (B, S, S)

    # boundary chains (B steps, tiny)

    a0 = _flat(*em(y[0]))

    def fchain(v, M):
        return logsumexp_rows(v[:, None] + M, axis=0), v

    _, alpha0s = jax.lax.scan(fchain, a0, ops)             # (B, S)

    bT = jnp.zeros(S, dtype)

    def bchain(v, M):
        return logsumexp_rows(M + v[None, :], axis=1), v

    _, betaEs = jax.lax.scan(bchain, bT, ops, reverse=True)  # (B, S)

    # parallel interior recompute
    def alpha_block(a0_vec, y_blk, m_blk):
        vs, vb = _unflat(a0_vec, N, Km1)

        def stp(c, inp):
            cvs, cvb = c
            y_t, valid = inp
            es, ebm = em(y_t)
            nvs, nvb = _fwd_step(cvs, cvb, es, ebm, w)
            cvs = jnp.where(valid, nvs, cvs)
            cvb = jnp.where(valid, nvb, cvb)
            return (cvs, cvb), _flat(cvs, cvb)

        _, outs = jax.lax.scan(stp, (vs, vb), (y_blk, m_blk))
        return outs                                        # (L, S)

    alphas = jax.vmap(alpha_block)(alpha0s, y_steps, mask)

    def beta_block(bE_vec, y_blk, m_blk):
        bs, bb = _unflat(bE_vec, N, Km1)

        def stp(c, inp):
            cbs, cbb = c
            y_t, valid = inp
            es, ebm = em(y_t)
            nbs, nbb = _bwd_step(cbs, cbb, es, ebm, w)
            cbs = jnp.where(valid, nbs, cbs)
            cbb = jnp.where(valid, nbb, cbb)
            return (cbs, cbb), _flat(cbs, cbb)

        _, outs = jax.lax.scan(stp, (bs, bb), (y_blk, m_blk), reverse=True)
        return outs                                        # (L, S) at sources

    betas_src = jax.vmap(beta_block)(betaEs, y_steps, mask)

    alpha = jnp.concatenate([a0[None], alphas.reshape(-1, S)[: T - 1]])
    # betas_src[i] = beta at the *source* sample of global step i, i.e. beta
    # at sample i (step i targets sample i+1); beta at T-1 is the terminal 0
    beta = jnp.concatenate([betas_src.reshape(-1, S)[: T - 1], bT[None]])
    return alpha, beta


def _fwd_step_max(vs, vb, es, ebm, w):
    """Max-plus mirror of _fwd_step (Viterbi scores, no backpointers).

    Same structural transitions; supports a leading batch axis like
    _fwd_step. Used to compute exact boundary Viterbi score vectors in
    parallel (block operators) and for parallel path-score replay.
    """
    ends = vb[..., :, -1]
    new_vs = jnp.maximum(
        vs + w["self_w"],
        jnp.max(ends + w["stay_w"], axis=-1)) + es
    swap = jnp.max(ends[..., :, None] + w["diag_mask"], axis=-2) + w["swap_w"]
    first = jnp.maximum(vs[..., None] + w["onset_w"], swap + w["lp"])
    new_vb = jnp.concatenate(
        [first[..., :, None], vb[..., :, :-1] + w["stay_w"]], axis=-1) + ebm
    return new_vs, new_vb


@partial(jax.jit, static_argnames=("L", "silent_start"))
def ring_viterbi_path_ll(y, lp, mu, sigma, x, *, L: int = 1024,
                         silent_start=True):
    """Reference cumulative-score ll (sum_t T1[x_t, t], src/viterbi.jl:92-96)
    for a known path x, computed block-parallel on the non-overlap space.

    Exact boundary score vectors come from max-plus block operators (the
    ring step vmapped over identity source rows); every block then replays
    its scores in parallel and emits the score at its path state. Matches
    the sequential engine's ll up to float reassociation at block
    boundaries.
    """
    dtype = mu.dtype
    y = y.astype(dtype)
    T = y.shape[0]
    K, N = mu.shape
    Km1 = K - 1
    S = 1 + N * Km1
    lp = jnp.asarray(lp, dtype)
    w = _weights(lp, dtype)
    em = _emission_fns(mu, sigma)

    Tm1 = T - 1
    B = -(-Tm1 // L)
    pad = B * L - Tm1
    y_steps = jnp.pad(y[1:], (0, pad)).reshape(B, L)
    x_steps = jnp.pad(x[1:], (0, pad)).reshape(B, L)
    mask = (jnp.arange(B * L) < Tm1).reshape(B, L)

    eyeS = jnp.where(jnp.eye(S, dtype=bool), 0.0, -jnp.inf).astype(dtype)

    def fwd_operator(y_blk, m_blk):
        VS, VB = _unflat(eyeS, N, Km1)

        def stp(c, inp):
            vs, vb = c
            y_t, valid = inp
            es, ebm = em(y_t)
            nvs, nvb = _fwd_step_max(vs, vb, es, ebm, w)
            return (jnp.where(valid, nvs, vs), jnp.where(valid, nvb, vb)), None

        (VS, VB), _ = jax.lax.scan(stp, (VS, VB), (y_blk, m_blk))
        return _flat(VS, VB)

    ops = jax.vmap(fwd_operator)(y_steps, mask)            # (B, S, S)

    es0, eb0 = em(y[0])
    v0 = _flat(es0, eb0)
    v0 = jnp.where(silent_start,
                   v0.at[0].set(jnp.asarray(0.0, dtype)), v0)

    def chain(v, M):
        return jnp.max(v[:, None] + M, axis=0), v

    _, v0s = jax.lax.scan(chain, v0, ops)                  # (B, S)

    state_iota = jnp.arange(S, dtype=jnp.int32)

    def replay_block(v_start, y_blk, x_blk, m_blk):
        vs, vb = _unflat(v_start, N, Km1)

        def stp(c, inp):
            cvs, cvb = c
            y_t, x_t, valid = inp
            es, ebm = em(y_t)
            nvs, nvb = _fwd_step_max(cvs, cvb, es, ebm, w)
            cvs = jnp.where(valid, nvs, cvs)
            cvb = jnp.where(valid, nvb, cvb)
            flat = _flat(cvs, cvb)
            score = jnp.sum(jnp.where(state_iota == x_t, flat, 0.0))
            return (cvs, cvb), jnp.where(valid, score, 0.0)

        _, scores = jax.lax.scan(stp, (vs, vb), (y_blk, x_blk, m_blk))
        return jnp.sum(scores)

    per_block = jax.vmap(replay_block)(v0s, y_steps, x_steps, mask)
    return jnp.sum(per_block)


def _overlap_edge_rows(T, L, H, B, W):
    """Rows whose uniform window [b*L - H, b*L - H + W) crosses a real
    signal edge, mapped to the roll that realigns the edge-clamped window
    back to uniform coordinates. Rows that can overrun the right edge:
    B-1 always (when T < B*L), and B-2 iff 0 < T mod L < H."""
    edge_rows = {0: H, B - 1: (T - W) - ((B - 1) * L - H)}
    if B >= 3 and (B - 1) * L + H > T:
        edge_rows[B - 2] = (T - W) - ((B - 2) * L - H)
    return edge_rows


def _overlap_window_1d(x, *, T, L, H, B, W, edge_rows):
    """(T,) -> (B, W) halo windows via the pad/reshape trick, with edge
    rows clamped to the real signal edges."""
    Tp = B * L
    x_ext = jnp.pad(x, (H, Tp - T + (L - H)))
    A = x_ext.reshape(B + 1, L)
    xw = jnp.concatenate([A[:B], A[1:, : 2 * H]], axis=1)      # (B, W)
    for b in edge_rows:
        start = 0 if b == 0 else T - W
        xw = xw.at[b].set(jax.lax.dynamic_slice_in_dim(x, start, W))
    return xw


def _overlap_guards(T, L, H, B, W):
    """Window-geometry guards shared by the overlap engines (the same
    constraints parallel/overlap_save.py enforces): H >= 1 keeps the
    telescoped-ll reads in range (pre = lse[H-1] would wrap at H == 0)
    and L >= 2H keeps interior windows inside the signal."""
    if H < 1 or L < 2 * H:
        raise ValueError(f"need 1 <= H <= L/2, got L={L} H={H}")
    if B < 2 or T < W:
        raise ValueError("signal shorter than two blocks; use the "
                         "sequential or blocked engine")


def _realign_and_telescope(alpha_w, beta_w, edge_rows, *, T, L, H, B):
    """Roll edge rows back to uniform window coordinates and compute the
    telescoped sequence ll from same-window lse differences. Shared by the
    single-channel and MC overlap engines so the subtle index arithmetic
    (pre = lse[H-1], endc = lse[H+L-1], the true-T last-row end) cannot
    diverge between them."""
    for b, shift in edge_rows.items():
        alpha_w = alpha_w.at[:, b].set(jnp.roll(alpha_w[:, b], shift,
                                                axis=0))
        beta_w = beta_w.at[:, b].set(jnp.roll(beta_w[:, b], shift, axis=0))
    lse = logsumexp_rows(alpha_w, axis=-1)                     # (W, B)
    pre = lse[H - 1]                                           # (B,)
    endc = lse[H + L - 1]                                      # (B,)
    iT = (T - 1) - ((B - 1) * L - H)
    last_end = lse[iT, B - 1]
    mid = jnp.sum(endc[1 : B - 1] - pre[1 : B - 1])
    ll = endc[0] + mid + (last_end - pre[B - 1])
    return alpha_w, beta_w, ll


@partial(jax.jit, static_argnames=("L", "H"))
def ring_overlap_forward_backward(y, lp, mu, sigma, *, L: int, H: int):
    """Overlap-save (halo-window) forward/backward: the block-parallel EM
    engine without S^2 operators.

    Each of B = ceil(T/L) windows [b*L - H, b*L + L + H) runs the plain
    sequential log-plus recursions with window-local init (the reference's
    forward init is emission-only anyway, src/baumwelch.jl:25-51, and
    beta's terminal is exact for the last window, which ends at the real
    T). Inside a window, alpha/beta are the true quantities up to one
    additive constant per window once the halo has mixed — and every EM
    statistic is a *per-t normalized* quantity in which those constants
    cancel exactly, provided alpha, beta, and the normalizer at each t are
    read from the SAME window (train/em.py does). The only global
    quantity, the sequence ll = lse(alpha[T-1]), telescopes over
    same-window differences:

        ll = lse(a_0(e_0)) + sum_{b>=1} [lse(a_b(e_b)) - lse(a_b(s_b-1))]

    (s_b/e_b = core start/end of window b; block 0 is init-exact), each
    difference is window-constant-free, so the halo approximation error is
    O(exp(-H / mixing)) — with H of a few template lengths it is below
    float precision (tested vs the exact engines).

    FLOPs: T * (1 + 2H/L) sequential-step work, B-way parallel — versus
    the blocked operator scheme's S x multiplier. This is the production
    EM mode on TPU.

    Returns (alpha_w, beta_w, y_win, ll): window tensors in (W, B, S)
    step-major layout, uniform window coordinates (edge rows realigned to
    the real signal edges), and the telescoped ll.
    """
    dtype = mu.dtype
    y = y.astype(dtype)
    T = y.shape[0]
    K, N = mu.shape
    lp = jnp.asarray(lp, dtype)
    w = _weights(lp, dtype)
    em = _emission_fns(mu, sigma)

    B = -(-T // L)
    W = L + 2 * H
    _overlap_guards(T, L, H, B, W)

    # uniform windows: row b covers [b*L - H, b*L - H + W) (reshape trick,
    # same construction as parallel/overlap_save.ring_overlap_save); rows
    # whose uniform window would cross a real signal edge decode the real
    # edge instead (zero padding is FAKE silence — a beta computed through
    # it biases the EM statistics near the boundary) and are rolled back
    # to uniform coordinates below.
    edge_rows = _overlap_edge_rows(T, L, H, B, W)
    y_win = _overlap_window_1d(y, T=T, L=L, H=H, B=B, W=W,
                               edge_rows=edge_rows)            # (B, W)

    y_steps = y_win.T                                          # (W, B)

    def bem(y_t):
        # batched emissions: y_t (B,) against body means (N, K-1)
        es, ebm = em(y_t[:, None, None])
        return es[:, 0, 0], ebm                  # (B,), (B, N, K-1)

    es0, eb0 = bem(y_steps[0])

    def fstep(c, y_t):
        vs, vb = c
        es, ebm = bem(y_t)
        vs, vb = _fwd_step(vs, vb, es, ebm, w)
        return (vs, vb), _flat(vs, vb)

    _, frest = jax.lax.scan(fstep, (es0, eb0), y_steps[1:])
    alpha_w = jnp.concatenate([_flat(es0, eb0)[None], frest], axis=0)

    bs0 = jnp.zeros((B,), dtype)
    bb0 = jnp.zeros((B, N, K - 1), dtype)

    def bstep(c, y_next):
        bs, bb = c
        es, ebm = bem(y_next)
        bs, bb = _bwd_step(bs, bb, es, ebm, w)
        return (bs, bb), _flat(bs, bb)

    _, brest = jax.lax.scan(bstep, (bs0, bb0), y_steps[1:], reverse=True)
    beta_w = jnp.concatenate([brest, _flat(bs0, bb0)[None]], axis=0)

    # realign edge rows to uniform coordinates (roll by
    # actual_start - uniform_start; uniform positions beyond the real
    # signal hold wrapped garbage, which the consumers mask/trim) and
    # telescope the ll from same-window lse differences
    for b, shift in edge_rows.items():
        y_win = y_win.at[b].set(jnp.roll(y_win[b], shift))
    alpha_w, beta_w, ll = _realign_and_telescope(
        alpha_w, beta_w, edge_rows, T=T, L=L, H=H, B=B)
    return alpha_w, beta_w, y_win, ll


def ring_overlap_forward_backward_mc(es, eb, lp, *, L: int, H: int):
    """Multi-channel overlap-save forward/backward from precomputed
    emission streams (a beyond-reference capability: the reference trains
    on channel 1 only, src/hmmsort.jl:56).

    The MC emission factorizes through core/emission_mc's stream form, so
    the channel axis is already collapsed before this engine runs: per
    step, state 0 reads es(t) and body state (n, k) reads eb(t, n, k) —
    exactly the numbers train/em_mc._mc_emission_dense stacks into its
    dense (T, S) table. Everything else (window protocol, edge-row
    clamping, window-local dead-pi init, telescoped ll) is identical to
    ring_overlap_forward_backward above; with C = 1 streams the two
    engines agree to float reassociation.

    es: (T,) silent-state log-emission; eb: (T, N, K-1) body
    log-emissions; lp: (N,) onset log-probs.
    Returns (alpha_w, beta_w, ll): (W, B, S) window tensors in uniform
    window coordinates plus the telescoped sequence ll.
    """
    dtype = es.dtype
    T = es.shape[0]
    _, N, Km1 = eb.shape
    lp = jnp.asarray(lp, dtype)
    w = _weights(lp, dtype)

    B = -(-T // L)
    W = L + 2 * H
    _overlap_guards(T, L, H, B, W)

    edge_rows = _overlap_edge_rows(T, L, H, B, W)
    win = partial(_overlap_window_1d, T=T, L=L, H=H, B=B, W=W,
                  edge_rows=edge_rows)
    es_steps = win(es).T                                       # (W, B)
    eb_w = jax.vmap(win)(eb.reshape(T, N * Km1).T)             # (NKm1, B, W)
    eb_steps = eb_w.transpose(2, 1, 0).reshape(W, B, N, Km1)

    es0, eb0 = es_steps[0], eb_steps[0]

    def fstep(c, inp):
        es_t, eb_t = inp
        vs, vb = _fwd_step(*c, es_t, eb_t, w)
        return (vs, vb), _flat(vs, vb)

    _, frest = jax.lax.scan(fstep, (es0, eb0),
                            (es_steps[1:], eb_steps[1:]))
    alpha_w = jnp.concatenate([_flat(es0, eb0)[None], frest], axis=0)

    bs0 = jnp.zeros((B,), dtype)
    bb0 = jnp.zeros((B, N, Km1), dtype)

    def bstep(c, inp):
        es_t, eb_t = inp
        bs, bb = _bwd_step(*c, es_t, eb_t, w)
        return (bs, bb), _flat(bs, bb)

    _, brest = jax.lax.scan(bstep, (bs0, bb0),
                            (es_steps[1:], eb_steps[1:]), reverse=True)
    beta_w = jnp.concatenate([brest, _flat(bs0, bb0)[None]], axis=0)

    alpha_w, beta_w, ll = _realign_and_telescope(
        alpha_w, beta_w, edge_rows, T=T, L=L, H=H, B=B)
    return alpha_w, beta_w, ll
