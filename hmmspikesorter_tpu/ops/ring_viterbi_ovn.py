"""Ring-structured Viterbi for pairwise-overlap spaces with any N.

Generalizes ops/ring_viterbi.ring_viterbi_ov2 to N neurons with at most two
simultaneously active (the reference's overlap model, src/types.jl:65-92):
state blocks are [silent | N single rings (K-1) | C(N,2) pair grids
(K-1)x(K-1), pairs enumerated i-major] — identical indexing to
core/state_space.py.

Structural transition cases (derived from src/types.jl:94-113; lpz =
log1p(-exp(sum(lp))), every still-silent neuron pays lpz):

  silent        <- silent (N lpz) | single(m,K-1) ((N-1)lpz)
                   | pair(i,j)@(end,end) ((N-2)lpz)
  single(n,1)   <- silent (lp_n+(N-1)lpz) | single(m!=n,K-1) (lp_n+(N-2)lpz)
                   | pair not containing n @(end,end) (lp_n+(N-3)lpz)
  single(n,k>1) <- single(n,k-1) ((N-1)lpz)
                   | pair(n,m)@(k-1,end) / pair(m,n)@(end,k-1) ((N-2)lpz)
  pair(i,j)@(1,1)     <- silent (lp_i+lp_j+(N-2)lpz)
                         | single(m not in p,K-1) (lp_i+lp_j+(N-3)lpz)
                         | disjoint pair @(end,end) (lp_i+lp_j+(N-4)lpz)
  pair(i,j)@(k1>1,1)  <- single(i,k1-1) (lp_j+(N-2)lpz)
                         | pair containing i, third m exits (lp_j+(N-3)lpz)
  pair(i,j)@(1,k2>1)  symmetric
  pair(i,j)@(k1>1,k2>1) <- pair(i,j)@(k1-1,k2-1) ((N-2)lpz)

The recursion step is TABLE-DRIVEN: all cross-pair interactions are
expressed as one-hot selection matmuls against static membership tables
(pairs-containing-n, third-member pair maps), so the compiled step is pure
elementwise ops, maxima, and tiny matmuls — no gathers (XLA lowers dynamic
gathers to scalar loops on TPU) and no trace-time unrolling, which is what
capped the earlier version at N <= 6. Any N is supported; trace/compile
cost grows with table sizes (O(N^2) states), not program size. One-hot
matmuls are exact selections (inputs are always finite: every stored state
score is reachable via the silent chain, so no -inf enters a matmul) and
are forced to Precision.HIGHEST — the default matmul precision rounds f32
operands to bf16 on TPU (and on some CPU paths), which would quietly
corrupt selected scores by ~1e-3 relative and flip labels near ties.

Tie-breaking keeps the reference's first-max in ascending source-state
order; candidate axes are always assembled in that order. Bit-parity with
the generic gather engine is tested for N = 2, 3, 4 (including forced
overlapping spikes) and N = 7 (past the old cap).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.logmath import HALF_LOG_2PI

NEG = -jnp.inf


def _pairs(N):
    return [(i, j) for i in range(N - 1) for j in range(i + 1, N)]


def _sel(oh, x):
    """Exact one-hot selection: matmul pinned to HIGHEST precision (the
    default rounds f32 operands to bf16 on the MXU, corrupting scores)."""
    return jnp.matmul(oh, x, precision=jax.lax.Precision.HIGHEST)


def sc_em_ovn(mu, sigma):
    """Single-channel overlap-space emission `em(y_t) -> (es, eb, ep)`
    from raw samples — the mean construction the Viterbi engine and the
    posterior FB engine (core/posterior.py) share verbatim."""
    dtype = mu.dtype
    pairs = _pairs(mu.shape[1])
    sigma = jnp.asarray(sigma, dtype)
    log_sigma = jnp.log(sigma)
    inv_2s2 = 1.0 / (2.0 * sigma * sigma)

    mu0_sum = jnp.sum(mu[0])
    # emission means
    sgl_mean = mu[1:].T + (mu0_sum - mu[0])[:, None]          # (N, K-1)
    pair_mean = jnp.stack([
        mu[1:, i][:, None] + mu[1:, j][None, :]
        + (mu0_sum - mu[0, i] - mu[0, j])
        for (i, j) in pairs])                                  # (P, K-1, K-1)
    silent_mean = mu0_sum

    def em(v):
        def g(m):
            d = v - m
            return -HALF_LOG_2PI - log_sigma - d * d * inv_2s2

        return g(silent_mean), g(sgl_mean), g(pair_mean)

    return em


@partial(jax.jit, static_argnames=("with_ll",))
def ring_viterbi_ovn(y, lp, mu, sigma, *, silent_start=True, with_ll=True):
    """Viterbi decode on the pairwise-overlap space, any N. Returns (x, ll).

    y: (T,); lp: (N,); mu: (K, N); sigma: scalar.
    """
    dtype = mu.dtype
    y = y.astype(dtype)
    K, N = mu.shape
    em = sc_em_ovn(mu, sigma)
    return _ovn_core(em, y[0], y[1:], lp, K, N, dtype,
                     silent_start=silent_start, with_ll=with_ll)


class OvnTables:
    """Static topology tables of the pairwise-overlap space — membership
    masks, pairs-containing-n and third-member maps, and their one-hot
    selection matrices. Shared by the Viterbi core below and the
    posterior FB engine (core/posterior.py), so the overlap-topology
    encoding has exactly one home."""

    def __init__(self, N: int, dtype):
        import numpy as np

        pairs = _pairs(N)
        P = len(pairs)
        pair_idx = {p: q for q, p in enumerate(pairs)}
        self.pairs, self.P, self.pair_idx = pairs, P, pair_idx

        pairs_i = np.asarray([i for (i, _) in pairs])
        pairs_j = np.asarray([j for (_, j) in pairs])
        self.pairs_i, self.pairs_j = pairs_i, pairs_j
        member = np.zeros((P, N), bool)
        member[np.arange(P), pairs_i] = True
        member[np.arange(P), pairs_j] = True
        disjoint = ~(member @ member.T > 0)                # (P, P)
        # pairs containing n, ascending q, and whether n is the i-slot
        Qn = np.zeros((N, max(N - 1, 1)), np.int64)
        ISn = np.zeros((N, max(N - 1, 1)), bool)
        for n in range(N):
            c = 0
            for q, (i, j) in enumerate(pairs):
                if n in (i, j):
                    Qn[n, c] = q
                    ISn[n, c] = n == i
                    c += 1
        # third-member maps: target pair q with member adv advancing and
        # third m exiting; source pair r contains (adv, m) with adv in
        # the i-slot iff adv < m
        nO = max(N - 2, 0)
        self.nO = nO
        rowP = np.zeros((P, nO), np.int64)
        rowI = np.zeros((P, nO), bool)
        colP = np.zeros((P, nO), np.int64)
        colI = np.zeros((P, nO), bool)
        m_idx = np.zeros((P, nO), np.int64)
        for q, (i, j) in enumerate(pairs):
            for c, m in enumerate(m for m in range(N) if m not in (i, j)):
                rowP[q, c] = pair_idx[(min(j, m), max(j, m))]
                rowI[q, c] = j == min(j, m)
                colP[q, c] = pair_idx[(min(i, m), max(i, m))]
                colI[q, c] = i == min(i, m)
                m_idx[q, c] = m
        self.m_idx = m_idx                # third member identities (P, nO)

        def _onehot(idx, active):
            """(R, P) exact-selection matrix (finite inputs: 0*x = 0)."""
            m = (np.arange(P)[None, :] == idx.reshape(-1)[:, None]) \
                & active.reshape(-1)[:, None]
            return jnp.asarray(m, dtype)

        self.OH_ring_i = _onehot(Qn, ISn)                  # (N*(N-1), P)
        self.OH_ring_j = _onehot(Qn, ~ISn)
        self.OH_row_i = _onehot(rowP, rowI)                # (P*(N-2), P)
        self.OH_row_j = _onehot(rowP, ~rowI)
        self.OH_col_i = _onehot(colP, colI)
        self.OH_col_j = _onehot(colP, ~colI)
        self.OH_jmem = jnp.asarray(
            np.arange(N)[None, :] == pairs_j[:, None], dtype)   # (P, N)
        self.OH_imem = jnp.asarray(
            np.arange(N)[None, :] == pairs_i[:, None], dtype)
        self.mask_diag = jnp.asarray(
            np.where(np.eye(N, dtype=bool), -np.inf, 0.0), dtype)
        self.mask_inpair = jnp.asarray(
            np.where(member.T, -np.inf, 0.0), dtype)
        self.mask_member = jnp.asarray(
            np.where(member, -np.inf, 0.0), dtype)
        self.mask_nondis = jnp.asarray(
            np.where(~disjoint, -np.inf, 0.0), dtype)


def _ovn_core(em, inp0, inps, lp, K, N, dtype, *, silent_start, with_ll):
    """The table-driven any-N overlap-space recursion, generic over the
    emission model: `em(inp_t) -> (es scalar, eb (N, K-1), ep (P, K-1, K-1))`
    per-step emission log-probs, fed the scan inputs `inps` (any pytree
    with leading axis T-1; inp0 is the t = 0 input). The single-channel
    engine passes the raw samples; the multi-channel engine passes its
    factorized (es, d) streams (ring_viterbi_ovn_mc). Dynamics, tables,
    tie-breaking, backtrace, and ll replay are shared verbatim."""
    Km1 = K - 1
    pairs = _pairs(N)
    P = len(pairs)
    lp = jnp.asarray(lp, dtype)
    lpz = jnp.log1p(-jnp.exp(jnp.sum(lp)))

    # state index helpers (flat layout)
    SGL = [1 + n * Km1 for n in range(N)]
    PAIR = [1 + N * Km1 + q * Km1 * Km1 for q in range(P)]
    S = 1 + N * Km1 + P * Km1 * Km1

    tab = OvnTables(N, dtype)
    pair_idx = tab.pair_idx
    nO = tab.nO
    OH_ring_i, OH_ring_j = tab.OH_ring_i, tab.OH_ring_j
    OH_row_i, OH_row_j = tab.OH_row_i, tab.OH_row_j
    OH_col_i, OH_col_j = tab.OH_col_i, tab.OH_col_j
    OH_jmem, OH_imem = tab.OH_jmem, tab.OH_imem
    mask_diag, mask_inpair = tab.mask_diag, tab.mask_inpair
    mask_member, mask_nondis = tab.mask_member, tab.mask_nondis
    lp_i = lp[jnp.asarray(tab.pairs_i)]                    # (P,)
    lp_j = lp[jnp.asarray(tab.pairs_j)]

    def maxplus_step(carry, inp_t, want_bp):
        vs, vb, vp = carry            # scalar, (N, K-1), (P, K-1, K-1)
        es, eb, ep = em(inp_t)
        ends = vb[:, -1]                                       # (N,)
        p_end = vp[:, -1, -1]                                  # (P,)
        colend = vp[:, :-1, -1]                                # (P, K-2)
        rowend = vp[:, -1, :-1]                                # (P, K-2)

        # ---- silent: [self | singles asc | pairs asc]
        sil_cand = jnp.concatenate([
            (vs + N * lpz)[None],
            ends + (N - 1) * lpz,
            p_end + (N - 2) * lpz])
        bp_sil = jnp.argmax(sil_cand).astype(jnp.int32)
        new_vs = jnp.max(sil_cand) + es

        # ---- single onset slots: per n, [silent | singles m | pairs q]
        on_cands = jnp.concatenate([
            (vs + lp + (N - 1) * lpz)[:, None],
            ends[None, :] + lp[:, None] + (N - 2) * lpz + mask_diag,
            p_end[None, :] + lp[:, None] + (N - 3) * lpz + mask_inpair,
        ], axis=1)                                             # (N, 1+N+P)
        bp_on = jnp.argmax(on_cands, axis=1).astype(jnp.int32)
        on_best = jnp.max(on_cands, axis=1)                    # (N,)

        # ---- single ring slots k>=2: per n, [same ring | pairs with n]
        pair_src = (_sel(OH_ring_i, colend)
                    + _sel(OH_ring_j, rowend)).reshape(N, N - 1, Km1 - 1)
        ring_cands = jnp.concatenate(
            [(vb[:, :-1] + (N - 1) * lpz)[:, None, :],
             pair_src + (N - 2) * lpz], axis=1)                # (N, N, K-2)
        bp_ring = jnp.argmax(ring_cands, axis=1).astype(jnp.int8)
        ring_best = jnp.max(ring_cands, axis=1)                # (N, K-2)

        new_vb = jnp.concatenate([on_best[:, None], ring_best], axis=1) + eb

        # ---- pair grids (batched over q)
        lpij = lp_i + lp_j
        cc = jnp.concatenate([
            (vs + lpij + (N - 2) * lpz)[:, None],
            ends[None, :] + lpij[:, None] + (N - 3) * lpz + mask_member,
            p_end[None, :] + lpij[:, None] + (N - 4) * lpz + mask_nondis,
        ], axis=1)                                             # (P, 1+N+P)
        bp_corner = jnp.argmax(cc, axis=1).astype(jnp.int32)
        corner = jnp.max(cc, axis=1)                           # (P,)

        # row k1=1, k2>=2: j advances; [single(j) | pairs (j,m)]
        slot0r = (_sel(OH_jmem, vb[:, :-1])
                  + lp_i[:, None] + (N - 2) * lpz)[:, None, :]
        if N > 2:
            rsrc = (_sel(OH_row_i, colend)
                    + _sel(OH_row_j, rowend)).reshape(P, nO, Km1 - 1)
            rc = jnp.concatenate(
                [slot0r, rsrc + lp_i[:, None, None] + (N - 3) * lpz],
                axis=1)                                        # (P, N-1, K-2)
        else:
            rc = slot0r
        bp_prow = jnp.argmax(rc, axis=1).astype(jnp.int8)
        row_best = jnp.max(rc, axis=1)                         # (P, K-2)

        # col k2=1, k1>=2: i advances; [single(i) | pairs (i,m)]
        slot0c = (_sel(OH_imem, vb[:, :-1])
                  + lp_j[:, None] + (N - 2) * lpz)[:, None, :]
        if N > 2:
            csrc = (_sel(OH_col_i, colend)
                    + _sel(OH_col_j, rowend)).reshape(P, nO, Km1 - 1)
            kc = jnp.concatenate(
                [slot0c, csrc + lp_j[:, None, None] + (N - 3) * lpz],
                axis=1)
        else:
            kc = slot0c
        bp_pcol = jnp.argmax(kc, axis=1).astype(jnp.int8)
        col_best = jnp.max(kc, axis=1)                         # (P, K-2)

        interior = vp[:, :-1, :-1] + (N - 2) * lpz             # (P, K-2, K-2)
        top = jnp.concatenate([corner[:, None], row_best], axis=1)
        rest = jnp.concatenate([col_best[:, :, None], interior], axis=2)
        new_vp = jnp.concatenate([top[:, None, :], rest], axis=1) + ep

        bp = None
        if want_bp:
            bp = (bp_sil, bp_on, bp_ring, bp_corner, bp_prow, bp_pcol)
        return (new_vs, new_vb, new_vp), bp

    es0, eb0, ep0 = em(inp0)
    vs0 = jnp.where(silent_start, jnp.asarray(0.0, dtype), es0)
    carry0 = (vs0, eb0, ep0)

    def step(c, inp_t):
        return maxplus_step(c, inp_t, True)

    (vsT, vbT, vpT), bps = jax.lax.scan(step, carry0, inps)

    flatT = jnp.concatenate([vsT[None], vbT.reshape(-1), vpT.reshape(-1)])
    xT = jnp.argmax(flatT).astype(jnp.int32)

    # ---------------- backtrace (pure arithmetic on the flag streams)
    # precomputed (static) decode tables for flag values -> state indices
    sil_src = jnp.asarray(
        [0] + [SGL[m] + Km1 - 1 for m in range(N)]
        + [PAIR[q] + Km1 * Km1 - 1 for q in range(P)], jnp.int32)
    on_src = sil_src                       # same candidate ordering
    # ring flag r for neuron n: 0 -> same ring (x-1); c>=1 -> pair source
    ring_src_pair = []                     # (N, N-1): per (n, c-1) the pair q
    ring_src_is_i = []
    for n in range(N):
        qs, isi = [], []
        for q, (i, j) in enumerate(pairs):
            if i == n:
                qs.append(q); isi.append(1)
            elif j == n:
                qs.append(q); isi.append(0)
        ring_src_pair.append(qs)
        ring_src_is_i.append(isi)
    ring_src_pair = jnp.asarray(ring_src_pair, jnp.int32)      # (N, N-1)
    ring_src_is_i = jnp.asarray(ring_src_is_i, jnp.int32)
    # corner flags: the table-driven step emits UNCOMPRESSED flags over
    # [silent | all singles asc | all pairs asc] (invalid slots are
    # -inf-masked and never win), so one shared 1-D decode table suffices
    corner_src = sil_src                                       # (1+N+P,)
    # row/col third-member pair tables per pair
    row_pair = []
    row_is_i = []                      # whether the advancing member (j) is
    #                                    the i-slot of the source pair
    col_pair = []
    col_is_i = []
    for q, (i, j) in enumerate(pairs):
        others = [m for m in range(N) if m not in (i, j)]
        rp, ri, cp, ci = [], [], [], []
        for m in others:
            r = pair_idx[(min(j, m), max(j, m))]
            rp.append(r); ri.append(1 if j == min(j, m) else 0)
            r2 = pair_idx[(min(i, m), max(i, m))]
            cp.append(r2); ci.append(1 if i == min(i, m) else 0)
        pad = (N - 2) - len(rp)
        row_pair.append(rp + [0] * pad)
        row_is_i.append(ri + [0] * pad)
        col_pair.append(cp + [0] * pad)
        col_is_i.append(ci + [0] * pad)
    row_pair = jnp.asarray(row_pair, jnp.int32).reshape(P, max(N - 2, 0) or 0)
    row_is_i = jnp.asarray(row_is_i, jnp.int32).reshape(P, max(N - 2, 0) or 0)
    col_pair = jnp.asarray(col_pair, jnp.int32).reshape(P, max(N - 2, 0) or 0)
    col_is_i = jnp.asarray(col_is_i, jnp.int32).reshape(P, max(N - 2, 0) or 0)

    sgl_base = jnp.asarray(SGL, jnp.int32)
    pair_base = jnp.asarray(PAIR, jnp.int32)

    def _onehot_i32(vec, idx):
        return jnp.sum(jnp.where(jnp.arange(vec.shape[0]) == idx,
                                 vec.astype(jnp.int32), 0))

    def back(x_next, bp_t):
        bp_sil, bp_on, bp_ring, bp_c, bp_pr, bp_pc = bp_t
        x = x_next

        # --- silent
        from_sil = sil_src[0] * 0 + _onehot_i32(sil_src, bp_sil)

        # --- single block: neuron n, slot k (0-based)
        sn = (x - 1) // Km1
        sk = (x - 1) % Km1
        n_c = jnp.clip(sn, 0, N - 1)
        onf = _onehot_i32(bp_on, n_c)                  # onset flag for n
        from_on = _onehot_i32(on_src, onf)
        ringf = jnp.sum(jnp.where(
            (jnp.arange(N)[:, None] == n_c)
            & (jnp.arange(Km1 - 1)[None, :] == sk - 1),
            bp_ring.astype(jnp.int32), 0))
        # ring flag 0 -> same ring; c >= 1 -> pair
        rq = jnp.sum(jnp.where(
            (jnp.arange(N)[:, None] == n_c)
            & (jnp.arange(max(N - 1, 1))[None, :] == ringf - 1),
            ring_src_pair, 0)) if N > 1 else 0
        r_isi = jnp.sum(jnp.where(
            (jnp.arange(N)[:, None] == n_c)
            & (jnp.arange(max(N - 1, 1))[None, :] == ringf - 1),
            ring_src_is_i, 0)) if N > 1 else 0
        # pair source state: n at sk-1 (grid index sk-1), other at end
        pair_state_i = (_onehot_i32(pair_base, rq)
                        + (sk - 1) * Km1 + (Km1 - 1))      # n is i-slot
        pair_state_j = (_onehot_i32(pair_base, rq)
                        + (Km1 - 1) * Km1 + (sk - 1))      # n is j-slot
        from_ring = jnp.where(ringf == 0, x - 1,
                              jnp.where(r_isi == 1, pair_state_i,
                                        pair_state_j))
        from_sgl = jnp.where(sk == 0, from_on, from_ring)

        # --- pair block: pair q, grid (a, b) 0-based
        xp = x - (1 + N * Km1)
        q_c = jnp.clip(xp // (Km1 * Km1), 0, P - 1)
        g = xp % (Km1 * Km1)
        a = g // Km1
        b = g % Km1
        cflag = _onehot_i32(bp_c, q_c)
        from_corner = _onehot_i32(corner_src, cflag)
        # row (a==0, b>=1): j advanced from b-1
        prf = jnp.sum(jnp.where(
            (jnp.arange(P)[:, None] == q_c)
            & (jnp.arange(Km1 - 1)[None, :] == b - 1),
            bp_pr.astype(jnp.int32), 0))
        pj = jnp.sum(jnp.where(jnp.arange(P) == q_c, sgl_base[
            jnp.asarray([j for (_, j) in pairs], jnp.int32)], 0))
        from_row_sgl = pj + (b - 1)
        if N > 2:
            rq2 = jnp.sum(jnp.where(
                (jnp.arange(P)[:, None] == q_c)
                & (jnp.arange(N - 2)[None, :] == prf - 1), row_pair, 0))
            risi2 = jnp.sum(jnp.where(
                (jnp.arange(P)[:, None] == q_c)
                & (jnp.arange(N - 2)[None, :] == prf - 1), row_is_i, 0))
            prow_state = jnp.where(
                risi2 == 1,
                _onehot_i32(pair_base, rq2) + (b - 1) * Km1 + (Km1 - 1),
                _onehot_i32(pair_base, rq2) + (Km1 - 1) * Km1 + (b - 1))
            from_row = jnp.where(prf == 0, from_row_sgl, prow_state)
        else:
            from_row = from_row_sgl
        # col (a>=1, b==0): i advanced from a-1
        pcf = jnp.sum(jnp.where(
            (jnp.arange(P)[:, None] == q_c)
            & (jnp.arange(Km1 - 1)[None, :] == a - 1),
            bp_pc.astype(jnp.int32), 0))
        pi_ = jnp.sum(jnp.where(jnp.arange(P) == q_c, sgl_base[
            jnp.asarray([i for (i, _) in pairs], jnp.int32)], 0))
        from_col_sgl = pi_ + (a - 1)
        if N > 2:
            cq2 = jnp.sum(jnp.where(
                (jnp.arange(P)[:, None] == q_c)
                & (jnp.arange(N - 2)[None, :] == pcf - 1), col_pair, 0))
            cisi2 = jnp.sum(jnp.where(
                (jnp.arange(P)[:, None] == q_c)
                & (jnp.arange(N - 2)[None, :] == pcf - 1), col_is_i, 0))
            pcol_state = jnp.where(
                cisi2 == 1,
                _onehot_i32(pair_base, cq2) + (a - 1) * Km1 + (Km1 - 1),
                _onehot_i32(pair_base, cq2) + (Km1 - 1) * Km1 + (a - 1))
            from_col = jnp.where(pcf == 0, from_col_sgl, pcol_state)
        else:
            from_col = from_col_sgl
        from_pair = jnp.where(
            (a == 0) & (b == 0), from_corner,
            jnp.where(a == 0, from_row,
                      jnp.where(b == 0, from_col, x - Km1 - 1)))

        x_prev = jnp.where(x == 0, from_sil,
                           jnp.where(x < 1 + N * Km1, from_sgl, from_pair))
        x_prev = x_prev.astype(jnp.int32)
        return x_prev, x_prev

    # Explicit flip + forward scan instead of scan(reverse=True): under
    # vmap, XLA:CPU (jax 0.9.0) miscompiles the reverse-scan slicing of
    # this many-element mixed-dtype flag pytree for some batch sizes
    # (observed: B=5, row 0 only — time-misaligned flag reads that decode
    # an invalid path; forward scores and the stored flags themselves are
    # bit-correct). The flipped forward scan is bit-identical semantics
    # and compiles correctly at every batch size (regression:
    # tests/test_vmap_batch_consistency.py).
    bps_f = jax.tree_util.tree_map(lambda a: jnp.flip(a, axis=0), bps)
    _, xs_r = jax.lax.scan(back, xT, bps_f)
    x = jnp.concatenate([jnp.flip(xs_r, axis=0), xT[None]])

    if not with_ll:
        return x, jnp.asarray(0.0, dtype)

    state_iota = jnp.arange(S, dtype=jnp.int32)

    def replay(carry, inp):
        inp_t, x_t = inp
        new_c, _ = maxplus_step(carry, inp_t, False)
        nvs, nvb, nvp = new_c
        flat = jnp.concatenate([nvs[None], nvb.reshape(-1), nvp.reshape(-1)])
        score = jnp.sum(jnp.where(state_iota == x_t, flat, 0.0))
        return new_c, score

    _, path_scores = jax.lax.scan(replay, carry0, (inps, x[1:]))
    return x, jnp.sum(path_scores)
