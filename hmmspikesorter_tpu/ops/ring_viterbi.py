"""Ring-structured Viterbi: the gather-free TPU fast path.

The generic engine (core/viterbi.py) gathers over a padded in-edge table;
XLA lowers those gathers to scalar-core loops on TPU, which dominates the
per-step cost. The ring topology makes every transition *structural*
(SURVEY.md §7): per neuron, the only moves are a deterministic ring shift,
a silent self-loop, an onset, and a ring-end collapse. The max-plus step is
therefore a handful of slices/rolls and elementwise maxima on
statically-shaped tensors — pure VPU work, no gathers, and the
backpointers shrink from (T, S) to O(T * N * K) bits of *choice* flags
(most states have exactly one predecessor).

State layout (identical indexing to core/state_space.py, reference
src/types.jl:65-92):
  0                      all-silent
  1 + n*(K-1) + (k-1)    single-active: neuron n at ring position k
  base + (k1-1)*(K-1) + (k2-1)   [N=2 overlap] pair grid, k1-major

Engines:
  * ring_viterbi_nov  — non-overlap space, any N.
  * ring_viterbi_ov2  — pairwise-overlap space for N == 2 (the production
    CLI/bench decode topology, 3600 states at K=60).
  * ops/ring_viterbi_ovn.ring_viterbi_ovn — pairwise-overlap, any N
    (table-driven).

Both reproduce the reference decode semantics bit-for-bit (validated
against the gather engine, which is itself oracle-bit-matched):
emission-only init + forced silent start (src/viterbi.jl:56-63), first-max
tie-break in in-edge source order (src/viterbi.jl:74-84), and the
cumulative-score ll (src/viterbi.jl:92-96) — computed by a second
score-replay scan so no (T, S) score tensor is ever stored.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.logmath import HALF_LOG_2PI


def _emission_consts(mu, sigma):
    """Per-structure emission means. mu: (K, N)."""
    silent_mean = jnp.sum(mu[0])            # all neurons at row 0
    body_mu = mu[1:].T                      # (N, K-1): neuron n at pos k
    return silent_mean, body_mu


# --------------------------------------------------------------------------
# non-overlap, any N
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("with_ll",))
def ring_viterbi_nov(y, lp, mu, sigma, *, silent_start=True, with_ll=True):
    """Viterbi decode on the non-overlap ring space. Returns (x, ll).

    y: (T,); lp: (N,) onset log-probs; mu: (K, N); sigma: scalar.
    """
    dtype = mu.dtype
    y = y.astype(dtype)
    K, N = mu.shape
    lp = jnp.asarray(lp, dtype)
    lpz = jnp.log1p(-jnp.exp(jnp.sum(lp)))
    silent_mean, body_mu = _emission_consts(mu, sigma)
    sigma = jnp.asarray(sigma, dtype)
    log_sigma = jnp.log(sigma)
    inv_2s2 = 1.0 / (2.0 * sigma * sigma)
    # silent neurons other than the mover contribute their mu[0] rows to the
    # state mean; body state (n, k) mean = mu[k, n] + sum_{m != n} mu[0, m]
    other_silent = silent_mean - mu[0]                  # (N,)
    body_mean = body_mu + other_silent[:, None]         # (N, K-1)

    def em(v):
        ds = v - silent_mean
        db = v - body_mean
        return (-HALF_LOG_2PI - log_sigma - ds * ds * inv_2s2,
                -HALF_LOG_2PI - log_sigma - db * db * inv_2s2)

    es0, eb0 = em(y[0])
    vs = jnp.where(silent_start, jnp.asarray(0.0, dtype), es0)
    vb = eb0

    onset_w = lp + (N - 1) * lpz                        # silent -> (n, 1)
    self_w = N * lpz                                    # silent self-loop
    stay_w = (N - 1) * lpz                              # one mover advances
    swap_w = (N - 2) * lpz                              # exit m + onset n
    # exit+onset edges (m,K-1) -> (n,1), m != n: candidate matrix rows =
    # [silent | ring-end m=0..N-1 (diag masked)], first-max in source order
    diag_mask = jnp.where(jnp.eye(N, dtype=bool), -jnp.inf, 0.0).astype(dtype)

    def onset_cands(vs, vb):
        """(1+N, N) candidates for targets (n,1), source-ascending rows."""
        sil = vs + onset_w                              # (N,)
        swap = vb[:, -1][:, None] + lp[None, :] + swap_w + diag_mask  # (N, N)
        return jnp.concatenate([sil[None, :], swap], axis=0)

    def step(carry, y_t):
        vs, vb = carry
        es, ebm = em(y_t)
        # silent: in-edge order = [self, ring-end n=0, 1, ...] (source asc);
        # a ring exit leaves the other N-1 neurons paying their stay-silent
        # term (types.jl:96-102)
        cand = jnp.concatenate([(vs + self_w)[None], vb[:, -1] + stay_w])
        bp_s = jnp.argmax(cand).astype(jnp.int32)       # first max
        new_vs = jnp.max(cand) + es
        # onset slot: silent or another neuron's same-step ring exit
        oc = onset_cands(vs, vb)                        # (1+N, N)
        bp_on = jnp.argmax(oc, axis=0).astype(jnp.int32)
        new_vb = jnp.concatenate(
            [jnp.max(oc, axis=0)[:, None], vb[:, :-1] + stay_w], axis=1) + ebm
        return (new_vs, new_vb), (bp_s, bp_on)

    (vsT, vbT), (bps, bp_ons) = jax.lax.scan(step, (vs, vb), y[1:])

    flatT = jnp.concatenate([vsT[None], vbT.reshape(-1)])
    xT = jnp.argmax(flatT).astype(jnp.int32)

    Km1 = K - 1
    ring_end = 1 + jnp.arange(N, dtype=jnp.int32) * Km1 + (Km1 - 1)

    n_iota = jnp.arange(N, dtype=jnp.int32)

    def back(x_next, bp_t):
        bp_s, bp_on = bp_t
        # silent: stored choice; single(n,1): silent or ring-end of the
        # stored m; single(n,k>1): previous ring slot (index - 1).
        # All flag reads are one-hot reductions (no dynamic gathers).
        from_sil = jnp.where(
            bp_s == 0, 0,
            jnp.sum(jnp.where(n_iota == bp_s - 1, ring_end, 0)))
        n = (x_next - 1) // Km1
        k = (x_next - 1) % Km1                          # 0 == position 1
        c = jnp.sum(jnp.where(n_iota == n, bp_on, 0))
        from_onset = jnp.where(
            c == 0, 0, jnp.sum(jnp.where(n_iota == c - 1, ring_end, 0)))
        x_prev = jnp.where(x_next == 0, from_sil,
                           jnp.where(k == 0, from_onset, x_next - 1))
        x_prev = x_prev.astype(jnp.int32)
        return x_prev, x_prev

    _, xs = jax.lax.scan(back, xT, (bps, bp_ons), reverse=True)
    x = jnp.concatenate([xs, xT[None]])

    if not with_ll:
        return x, jnp.asarray(0.0, dtype)

    # score replay along the known path (reference ll, viterbi.jl:92-96)
    S = 1 + N * Km1
    state_iota = jnp.arange(S, dtype=jnp.int32)

    def replay(carry, inp):
        vs, vb = carry
        y_t, x_t = inp
        es, ebm = em(y_t)
        new_vs = jnp.maximum(vs + self_w, jnp.max(vb[:, -1] + stay_w)) + es
        first = jnp.max(onset_cands(vs, vb), axis=0)
        new_vb = jnp.concatenate(
            [first[:, None], vb[:, :-1] + stay_w], axis=1) + ebm
        flat = jnp.concatenate([new_vs[None], new_vb.reshape(-1)])
        score = jnp.sum(jnp.where(state_iota == x_t, flat, 0.0))
        return (new_vs, new_vb), score

    _, path_scores = jax.lax.scan(replay, (vs, vb), (y[1:], x[1:]))
    return x, jnp.sum(path_scores)


# --------------------------------------------------------------------------
# pairwise overlap, N == 2
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("with_ll",))
def ring_viterbi_ov2(y, lp, mu, sigma, *, silent_start=True, with_ll=True):
    """Viterbi decode on the N=2 pairwise-overlap space. Returns (x, ll).

    State blocks: silent | single n0 (K-1) | single n1 (K-1) |
    pair grid (K-1, K-1) k1-major. All transition cases are structural
    (derived from reference src/types.jl:94-113 for N=2):
      silent   <- silent(2*lpz) | end(n0) | end(n1) | pair end (K-1, K-1)
      sgl(0,1) <- silent + lp0 + lpz | end(n1) + lp0
      sgl(0,k) <- sgl(0,k-1) + lpz | pair(k-1, K-1)      [n1 exits]
      sgl(1,*) symmetric
      pair(1,1)   <- silent + lp0 + lp1
      pair(k1,1)  <- sgl(0, k1-1) + lp1
      pair(1,k2)  <- sgl(1, k2-1) + lp0
      pair(k1,k2) <- pair(k1-1, k2-1)                     [diagonal shift]
    """
    dtype = mu.dtype
    y = y.astype(dtype)
    K = mu.shape[0]
    assert mu.shape[1] == 2, "ring_viterbi_ov2 requires exactly 2 neurons"
    Km1 = K - 1
    lp = jnp.asarray(lp, dtype)
    lp0, lp1 = lp[0], lp[1]
    lpz = jnp.log1p(-jnp.exp(jnp.sum(lp)))
    sigma = jnp.asarray(sigma, dtype)
    log_sigma = jnp.log(sigma)
    inv_2s2 = 1.0 / (2.0 * sigma * sigma)

    silent_mean = mu[0, 0] + mu[0, 1]
    b0_mean = mu[1:, 0] + mu[0, 1]                      # (K-1,)
    b1_mean = mu[1:, 1] + mu[0, 0]
    pair_mean = mu[1:, 0][:, None] + mu[1:, 1][None, :]  # (K-1, K-1)

    def em(v):
        def g(m):
            d = v - m
            return -HALF_LOG_2PI - log_sigma - d * d * inv_2s2

        return g(silent_mean), g(b0_mean), g(b1_mean), g(pair_mean)

    es0, e00, e10, ep0 = em(y[0])
    vs = jnp.where(silent_start, jnp.asarray(0.0, dtype), es0)
    v0, v1, vp = e00, e10, ep0

    neg_inf = jnp.asarray(-jnp.inf, dtype)

    def maxplus_step(carry, y_t, want_bp):
        vs, v0, v1, vp = carry
        es, e0, e1, ep = em(y_t)
        # silent: source-ascending order [self, end0, end1, pair end];
        # a single ring exit leaves the other neuron paying lpz, a pair
        # double-exit leaves no silent neuron (types.jl:96-102)
        # (all maxima are taken with jnp.max, never cand[argmax] — scalar
        # dynamic gathers lower to slow scalar-core loops on TPU)
        cand_s = jnp.stack([vs + 2 * lpz, v0[-1] + lpz, v1[-1] + lpz,
                            vp[-1, -1]])
        bp_s = jnp.argmax(cand_s).astype(jnp.int32)
        new_vs = jnp.max(cand_s) + es
        # singles: onset slot [silent | other end], ring slots
        # [same ring + lpz | pair col/row with other at K-1]
        on0 = jnp.stack([vs + lp0 + lpz, v1[-1] + lp0])
        on1 = jnp.stack([vs + lp1 + lpz, v0[-1] + lp1])
        b0_on = jnp.argmax(on0).astype(jnp.int32)
        b1_on = jnp.argmax(on1).astype(jnp.int32)
        r0 = jnp.stack([v0[:-1] + lpz, vp[:-1, -1]])     # (2, K-2)
        r1 = jnp.stack([v1[:-1] + lpz, vp[-1, :-1]])
        b0_ring = jnp.argmax(r0, axis=0).astype(jnp.int8)
        b1_ring = jnp.argmax(r1, axis=0).astype(jnp.int8)
        new_v0 = jnp.concatenate([jnp.max(on0)[None],
                                  jnp.max(r0, axis=0)]) + e0
        new_v1 = jnp.concatenate([jnp.max(on1)[None],
                                  jnp.max(r1, axis=0)]) + e1
        # pair grid: all single-predecessor
        top = jnp.concatenate([(vs + lp0 + lp1)[None], v1[:-1] + lp0])  # row k1=1
        left = v0[:-1] + lp1                             # col k2=1, k1>1
        interior = vp[:-1, :-1]
        new_vp = jnp.concatenate(
            [top[None, :],
             jnp.concatenate([left[:, None], interior], axis=1)],
            axis=0) + ep
        bp = (bp_s, b0_on, b1_on, b0_ring, b1_ring) if want_bp else None
        return (new_vs, new_v0, new_v1, new_vp), bp

    def step(carry, y_t):
        return maxplus_step(carry, y_t, True)

    (vsT, v0T, v1T, vpT), bps = jax.lax.scan(step, (vs, v0, v1, vp), y[1:])

    flatT = jnp.concatenate([vsT[None], v0T, v1T, vpT.reshape(-1)])
    xT = jnp.argmax(flatT).astype(jnp.int32)

    SGL0, SGL1, PAIR = 1, 1 + Km1, 1 + 2 * Km1

    ring_iota = jnp.arange(Km1 - 1, dtype=jnp.int32)

    def back(x_next, bp_t):
        bp_s, b0_on, b1_on, b0_ring, b1_ring = bp_t
        end0, end1 = SGL0 + Km1 - 1, SGL1 + Km1 - 1
        pair_end = PAIR + (Km1 - 1) * Km1 + (Km1 - 1)

        # silent: 4-way select on the stored choice (no dynamic gather)
        from_sil = jnp.where(
            bp_s == 0, 0,
            jnp.where(bp_s == 1, end0, jnp.where(bp_s == 2, end1, pair_end)))
        # single 0 at position k (0-based slot j = x - SGL0); the ring-slot
        # choice flag is read by one-hot reduction, not a dynamic gather
        j0 = x_next - SGL0
        c0 = jnp.sum(jnp.where(ring_iota == j0 - 1,
                               b0_ring.astype(jnp.int32), 0))
        from_s0 = jnp.where(
            j0 == 0,
            jnp.where(b0_on == 0, 0, end1),
            jnp.where(c0 == 0,
                      x_next - 1,                        # same ring
                      PAIR + (j0 - 1) * Km1 + (Km1 - 1)))  # pair(j0, K-1)
        j1 = x_next - SGL1
        c1 = jnp.sum(jnp.where(ring_iota == j1 - 1,
                               b1_ring.astype(jnp.int32), 0))
        from_s1 = jnp.where(
            j1 == 0,
            jnp.where(b1_on == 0, 0, end0),
            jnp.where(c1 == 0,
                      x_next - 1,
                      PAIR + (Km1 - 1) * Km1 + (j1 - 1)))  # pair(K-1, j1)
        # pair at grid (a, b) 0-based
        jp = x_next - PAIR
        a, b = jp // Km1, jp % Km1
        from_p = jnp.where(
            (a == 0) & (b == 0), 0,
            jnp.where(b == 0, SGL0 + a - 1,              # <- single0(a)
                      jnp.where(a == 0, SGL1 + b - 1,    # <- single1(b)
                                x_next - Km1 - 1)))      # diagonal
        x_prev = jnp.where(
            x_next == 0, from_sil,
            jnp.where(x_next < SGL1, from_s0,
                      jnp.where(x_next < PAIR, from_s1, from_p)))
        x_prev = x_prev.astype(jnp.int32)
        return x_prev, x_prev

    _, xs = jax.lax.scan(back, xT, bps, reverse=True)
    x = jnp.concatenate([xs, xT[None]])

    if not with_ll:
        return x, jnp.asarray(0.0, dtype)

    S = 1 + 2 * Km1 + Km1 * Km1
    state_iota = jnp.arange(S, dtype=jnp.int32)

    def replay(carry, inp):
        y_t, x_t = inp
        new_carry, _ = maxplus_step(carry, y_t, False)
        nvs, nv0, nv1, nvp = new_carry
        flat = jnp.concatenate([nvs[None], nv0, nv1, nvp.reshape(-1)])
        score = jnp.sum(jnp.where(state_iota == x_t, flat, 0.0))
        return new_carry, score

    _, path_scores = jax.lax.scan(replay, (vs, v0, v1, vp), (y[1:], x[1:]))
    return x, jnp.sum(path_scores)


@partial(jax.jit, static_argnames=("engine_name",))
def _block_decode_batched(y_win, sil, lp, mu, sigma, *, engine_name: str):
    """Module-level jitted batch decode: repeated calls with the same
    shapes hit the global jit cache. (A per-call jit(lambda ...) closure
    would recompile the whole program — including the Pallas kernels —
    on every fit_spiking_model_fast invocation: tens of seconds through
    the remote compiler.)"""
    from .ring_viterbi_ovn import ring_viterbi_ovn

    if engine_name == "pallas":
        from .pallas_viterbi_mb import ov2_decode_pallas_mb

        x = ov2_decode_pallas_mb(y_win, lp, mu, sigma, silent_mask=sil)
    elif engine_name == "pallas_ovn":
        from .pallas_viterbi_ovn_mb import ovn_decode_pallas_mb

        x = ovn_decode_pallas_mb(y_win, lp, mu, sigma, silent_mask=sil)
    else:
        engine = {"nov": ring_viterbi_nov, "ov2": ring_viterbi_ov2,
                  "ovn": ring_viterbi_ovn}[engine_name]
        one = lambda yy, s0: engine(yy, lp, mu, sigma, silent_start=s0,
                                    with_ll=False)[0]
        x = jax.vmap(one)(y_win, sil)
    # int16 when the state space fits: halves the device->host label
    # transfer, which dominates streaming wall time on tunneled backends
    K, N = mu.shape
    S = (1 + N * (K - 1) + (N * (N - 1) // 2) * (K - 1) ** 2
         if engine_name in ("ov2", "ovn", "pallas", "pallas_ovn")
         else 1 + N * (K - 1))
    return x.astype(jnp.int16) if S <= 32767 else x


def ring_block_decoder(lp, mu, sigma, *, overlaps: bool,
                       block_engine: str = "ring"):
    """Batched windowed decoder for overlap_save_decode_long: returns a
    callable ((B, W) windows, (B,) bool silent-start rows) -> (B, W)
    integer labels (int16 when the state space fits, else int32) using
    the ring-structured engines (emission-only init except flagged rows),
    or the fused multi-block Pallas kernels (block_engine="pallas" for the
    N=2 overlap topology, "pallas_ovn" for general N >= 2, TPU only)."""
    lp = jnp.asarray(lp)
    mu = jnp.asarray(mu)
    N = mu.shape[1]
    if block_engine == "pallas":
        if not overlaps or N != 2:
            raise ValueError("pallas block engine requires the N=2 "
                             "overlap topology")
        name = "pallas"
    elif block_engine == "pallas_ovn":
        if not overlaps or N < 2:
            raise ValueError("pallas_ovn block engine requires an overlap "
                             "topology with N >= 2")
        name = "pallas_ovn"
    elif overlaps and N >= 2:
        name = "ov2" if N == 2 else "ovn"
    else:
        # non-overlap — or N < 2, whose overlap space has no pair
        # columns and equals the non-overlap space exactly
        name = "nov"
    return lambda yw, sil: _block_decode_batched(yw, sil, lp, mu, sigma,
                                                 engine_name=name)
