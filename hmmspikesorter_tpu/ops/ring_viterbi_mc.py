"""Multi-channel ring-structured Viterbi engines.

Capability extension beyond the reference (which discards all template
channels but the first, src/hmmsort.jl:56): decode with every channel's
evidence jointly. The factorized emission (core/emission_mc.py) reduces
the C-channel Gaussian product to

    silent slot:  es(t)                       -- a (T,) stream
    body slot:    es(t) + d[t, n, k] - c1[n, k]
    pair slot:    eb_n[k1] + eb_m[k2] - es(t) + x2[(n,m)][k1, k2]

where d comes from ONE (T, C) x (C, N*(K-1)) MXU matmul and c1/x2 are
static energy tables. The max-plus dynamics below are exactly those of the
single-channel engines (ops/ring_viterbi.py — same slices/rolls, same
first-max tie-break in source-ascending order matching src/viterbi.jl:74-84,
same forced silent start src/viterbi.jl:63, same cumulative-score ll
src/viterbi.jl:92-96); only the per-step emission reads changed from inline
(y - mean)^2 to stream slices. With C = 1 these reduce to the single-channel
model exactly (up to float reassociation of the expanded square).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.emission_mc import MCTables, mc_streams


def _prep(yc, lp, mu, sigmas, dtype=None):
    tables = MCTables(mu, sigmas)
    yc = jnp.asarray(yc)
    if dtype is None:
        dtype = yc.dtype if yc.dtype in (jnp.float32, jnp.float64) \
            else jnp.float32
    es, d = mc_streams(yc, tables, dtype=dtype)
    return tables, es, d, dtype


def mc_em_nov(c1):
    """Non-overlap stream emission: eb = (es + d) - c1. Shared by the
    Viterbi scan below and the posterior FB engine (core/posterior.py) so
    the factorized-emission association has one home per topology."""
    def em(es_t, d_t):
        return es_t, es_t + d_t - c1                    # scalar, (N, Km1)

    return em


def mc_em_ov2(c1, x2):
    """N=2 overlap stream emission (cross-form pair table x2)."""
    def em(es_t, d_t):
        e0 = es_t + d_t[0] - c1[0]                      # (Km1,)
        e1 = es_t + d_t[1] - c1[1]
        ep = e0[:, None] + e1[None, :] - es_t + x2      # (Km1, Km1)
        return es_t, e0, e1, ep

    return em


def mc_em_ovn(c1, c2, pairs):
    """Any-N overlap stream emission (direct-form pair tables c2,
    pairs i-major)."""
    def em(es_t, d_t):
        eb = es_t + d_t - c1                            # (N, Km1)
        ep = jnp.stack([es_t + d_t[i][:, None] + d_t[j][None, :]
                        for (i, j) in pairs]) - c2      # (P, Km1, Km1)
        return es_t, eb, ep

    return em


@partial(jax.jit, static_argnames=("with_ll",))
def _nov_mc_scan(es, d, lp, c1, *, silent_start=True, with_ll=True):
    """Non-overlap-space decode from MC streams. es: (T,), d: (T, N, Km1),
    c1: (N, Km1) static energies. Dynamics mirror ring_viterbi_nov."""
    dtype = es.dtype
    T, N, Km1 = d.shape
    lp = jnp.asarray(lp, dtype)
    lpz = jnp.log1p(-jnp.exp(jnp.sum(lp)))

    em = mc_em_nov(c1)

    es0, eb0 = em(es[0], d[0])
    vs = jnp.where(silent_start, jnp.asarray(0.0, dtype), es0)
    vb = eb0

    onset_w = lp + (N - 1) * lpz
    self_w = N * lpz
    stay_w = (N - 1) * lpz
    swap_w = (N - 2) * lpz
    diag_mask = jnp.where(jnp.eye(N, dtype=bool), -jnp.inf, 0.0).astype(dtype)

    def onset_cands(vs, vb):
        sil = vs + onset_w
        swap = vb[:, -1][:, None] + lp[None, :] + swap_w + diag_mask
        return jnp.concatenate([sil[None, :], swap], axis=0)

    def step(carry, inp):
        vs, vb = carry
        es_t, ebm = em(*inp)
        cand = jnp.concatenate([(vs + self_w)[None], vb[:, -1] + stay_w])
        bp_s = jnp.argmax(cand).astype(jnp.int32)
        new_vs = jnp.max(cand) + es_t
        oc = onset_cands(vs, vb)
        bp_on = jnp.argmax(oc, axis=0).astype(jnp.int32)
        new_vb = jnp.concatenate(
            [jnp.max(oc, axis=0)[:, None], vb[:, :-1] + stay_w], axis=1) + ebm
        return (new_vs, new_vb), (bp_s, bp_on)

    (vsT, vbT), (bps, bp_ons) = jax.lax.scan(step, (vs, vb),
                                             (es[1:], d[1:]))

    flatT = jnp.concatenate([vsT[None], vbT.reshape(-1)])
    xT = jnp.argmax(flatT).astype(jnp.int32)

    ring_end = 1 + jnp.arange(N, dtype=jnp.int32) * Km1 + (Km1 - 1)
    n_iota = jnp.arange(N, dtype=jnp.int32)

    def back(x_next, bp_t):
        bp_s, bp_on = bp_t
        from_sil = jnp.where(
            bp_s == 0, 0,
            jnp.sum(jnp.where(n_iota == bp_s - 1, ring_end, 0)))
        n = (x_next - 1) // Km1
        k = (x_next - 1) % Km1
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

    S = 1 + N * Km1
    state_iota = jnp.arange(S, dtype=jnp.int32)

    def replay(carry, inp):
        vs, vb = carry
        es_t, d_t, x_t = inp
        es_e, ebm = em(es_t, d_t)
        new_vs = jnp.maximum(vs + self_w, jnp.max(vb[:, -1] + stay_w)) + es_e
        first = jnp.max(onset_cands(vs, vb), axis=0)
        new_vb = jnp.concatenate(
            [first[:, None], vb[:, :-1] + stay_w], axis=1) + ebm
        flat = jnp.concatenate([new_vs[None], new_vb.reshape(-1)])
        score = jnp.sum(jnp.where(state_iota == x_t, flat, 0.0))
        return (new_vs, new_vb), score

    _, path_scores = jax.lax.scan(replay, (vs, vb), (es[1:], d[1:], x[1:]))
    return x, jnp.sum(path_scores)


def ring_viterbi_nov_mc(yc, lp, mu, sigmas, *, silent_start=True,
                        with_ll=True):
    """Multi-channel Viterbi on the non-overlap ring space.

    yc: (T, C); lp: (N,); mu: (K, N, C); sigmas: (C,). Returns (x, ll)
    with the single-channel label/ll contracts.
    """
    tables, es, d, dtype = _prep(yc, lp, mu, sigmas)
    c1 = jnp.asarray(tables.c1, dtype)
    return _nov_mc_scan(es, d, lp, c1, silent_start=silent_start,
                        with_ll=with_ll)


@partial(jax.jit, static_argnames=("with_ll",))
def _ov2_mc_scan(es, d, lp, c1, x2, *, silent_start=True, with_ll=True):
    """N=2 pairwise-overlap decode from MC streams. x2: (Km1, Km1) static
    pair correction. Dynamics mirror ring_viterbi_ov2 (state blocks
    silent | single n0 | single n1 | pair grid k1-major)."""
    dtype = es.dtype
    T, N, Km1 = d.shape
    assert N == 2
    lp = jnp.asarray(lp, dtype)
    lp0, lp1 = lp[0], lp[1]
    lpz = jnp.log1p(-jnp.exp(jnp.sum(lp)))

    em = mc_em_ov2(c1, x2)

    es0, e00, e10, ep0 = em(es[0], d[0])
    vs = jnp.where(silent_start, jnp.asarray(0.0, dtype), es0)
    v0, v1, vp = e00, e10, ep0

    def maxplus_step(carry, inp, want_bp):
        vs, v0, v1, vp = carry
        es_t, e0, e1, ep = em(*inp)
        cand_s = jnp.stack([vs + 2 * lpz, v0[-1] + lpz, v1[-1] + lpz,
                            vp[-1, -1]])
        bp_s = jnp.argmax(cand_s).astype(jnp.int32)
        new_vs = jnp.max(cand_s) + es_t
        on0 = jnp.stack([vs + lp0 + lpz, v1[-1] + lp0])
        on1 = jnp.stack([vs + lp1 + lpz, v0[-1] + lp1])
        b0_on = jnp.argmax(on0).astype(jnp.int32)
        b1_on = jnp.argmax(on1).astype(jnp.int32)
        r0 = jnp.stack([v0[:-1] + lpz, vp[:-1, -1]])
        r1 = jnp.stack([v1[:-1] + lpz, vp[-1, :-1]])
        b0_ring = jnp.argmax(r0, axis=0).astype(jnp.int8)
        b1_ring = jnp.argmax(r1, axis=0).astype(jnp.int8)
        new_v0 = jnp.concatenate([jnp.max(on0)[None],
                                  jnp.max(r0, axis=0)]) + e0
        new_v1 = jnp.concatenate([jnp.max(on1)[None],
                                  jnp.max(r1, axis=0)]) + e1
        top = jnp.concatenate([(vs + lp0 + lp1)[None], v1[:-1] + lp0])
        left = v0[:-1] + lp1
        interior = vp[:-1, :-1]
        new_vp = jnp.concatenate(
            [top[None, :],
             jnp.concatenate([left[:, None], interior], axis=1)],
            axis=0) + ep
        bp = (bp_s, b0_on, b1_on, b0_ring, b1_ring) if want_bp else None
        return (new_vs, new_v0, new_v1, new_vp), bp

    def step(carry, inp):
        return maxplus_step(carry, inp, True)

    (vsT, v0T, v1T, vpT), bps = jax.lax.scan(step, (vs, v0, v1, vp),
                                             (es[1:], d[1:]))

    flatT = jnp.concatenate([vsT[None], v0T, v1T, vpT.reshape(-1)])
    xT = jnp.argmax(flatT).astype(jnp.int32)

    SGL0, SGL1, PAIR = 1, 1 + Km1, 1 + 2 * Km1
    ring_iota = jnp.arange(Km1 - 1, dtype=jnp.int32)

    def back(x_next, bp_t):
        bp_s, b0_on, b1_on, b0_ring, b1_ring = bp_t
        end0, end1 = SGL0 + Km1 - 1, SGL1 + Km1 - 1
        pair_end = PAIR + (Km1 - 1) * Km1 + (Km1 - 1)
        from_sil = jnp.where(
            bp_s == 0, 0,
            jnp.where(bp_s == 1, end0, jnp.where(bp_s == 2, end1, pair_end)))
        j0 = x_next - SGL0
        c0 = jnp.sum(jnp.where(ring_iota == j0 - 1,
                               b0_ring.astype(jnp.int32), 0))
        from_s0 = jnp.where(
            j0 == 0,
            jnp.where(b0_on == 0, 0, end1),
            jnp.where(c0 == 0, x_next - 1,
                      PAIR + (j0 - 1) * Km1 + (Km1 - 1)))
        j1 = x_next - SGL1
        c1_ = jnp.sum(jnp.where(ring_iota == j1 - 1,
                                b1_ring.astype(jnp.int32), 0))
        from_s1 = jnp.where(
            j1 == 0,
            jnp.where(b1_on == 0, 0, end0),
            jnp.where(c1_ == 0, x_next - 1,
                      PAIR + (Km1 - 1) * Km1 + (j1 - 1)))
        jp = x_next - PAIR
        a, b = jp // Km1, jp % Km1
        from_p = jnp.where(
            (a == 0) & (b == 0), 0,
            jnp.where(b == 0, SGL0 + a - 1,
                      jnp.where(a == 0, SGL1 + b - 1,
                                x_next - Km1 - 1)))
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
        es_t, d_t, x_t = inp
        new_carry, _ = maxplus_step(carry, (es_t, d_t), False)
        nvs, nv0, nv1, nvp = new_carry
        flat = jnp.concatenate([nvs[None], nv0, nv1, nvp.reshape(-1)])
        score = jnp.sum(jnp.where(state_iota == x_t, flat, 0.0))
        return new_carry, score

    _, path_scores = jax.lax.scan(replay, (vs, v0, v1, vp),
                                  (es[1:], d[1:], x[1:]))
    return x, jnp.sum(path_scores)


def ring_viterbi_ov2_mc(yc, lp, mu, sigmas, *, silent_start=True,
                        with_ll=True):
    """Multi-channel Viterbi on the N=2 pairwise-overlap space.

    yc: (T, C); lp: (2,); mu: (K, 2, C); sigmas: (C,). Returns (x, ll).
    """
    assert mu.shape[1] == 2, "ring_viterbi_ov2_mc requires exactly 2 neurons"
    tables, es, d, dtype = _prep(yc, lp, mu, sigmas)
    c1 = jnp.asarray(tables.c1, dtype)
    x2 = jnp.asarray(tables.x2[(0, 1)], dtype)
    return _ov2_mc_scan(es, d, lp, c1, x2, silent_start=silent_start,
                        with_ll=with_ll)


@partial(jax.jit, static_argnames=("with_ll",))
def _ovn_mc_scan(es, d, lp, c1, c2, *, silent_start=True, with_ll=True):
    """Any-N pairwise-overlap decode from MC streams: the table-driven
    engine's dynamics (ops/ring_viterbi_ovn._ovn_core) with the factorized
    MC emission — eb = es + d - c1, ep[q] = es + d_i (+) d_j - c2[q].
    c2: (P, Km1, Km1) static pair energies, pairs enumerated i-major."""
    from .ring_viterbi_ovn import _ovn_core, _pairs

    dtype = es.dtype
    _, N, Km1 = d.shape
    K = Km1 + 1
    pairs = _pairs(N)

    em_sd = mc_em_ovn(c1, c2, pairs)

    def em(inp):
        return em_sd(*inp)

    return _ovn_core(em, (es[0], d[0]), (es[1:], d[1:]), lp, K, N, dtype,
                     silent_start=silent_start, with_ll=with_ll)


def ring_viterbi_ovn_mc(yc, lp, mu, sigmas, *, silent_start=True,
                        with_ll=True):
    """Multi-channel Viterbi on the pairwise-overlap space, any N.

    yc: (T, C); lp: (N,); mu: (K, N, C); sigmas: (C,). Returns (x, ll).
    """
    tables, es, d, dtype = _prep(yc, lp, mu, sigmas)
    c1 = jnp.asarray(tables.c1, dtype)
    pairs = sorted(tables.c2)
    c2 = jnp.asarray(np.stack([tables.c2[p] for p in pairs]), dtype)
    return _ovn_mc_scan(es, d, lp, c1, c2, silent_start=silent_start,
                        with_ll=with_ll)


@partial(jax.jit, static_argnames=("engine_name",))
def _mc_block_decode_batched(y_win, sil, lp, c1, cx, zscale, silent_sum,
                             ub, delta, *, engine_name: str):
    """Module-level jitted batch decode over raw (B, W, C) signal windows:
    the streams are computed on-device (windowing commutes with the
    pointwise channel-collapsing projection, so labels match the one-shot
    mc_overlap_save bit-wise), then every window decodes under one vmap.
    Module-level so repeated streaming calls hit the global jit cache
    (the same recompile-per-call hazard ring_viterbi._block_decode_batched
    documents). ub = [u_const, b_sil]."""
    from ..core.emission_mc import _PREC

    dtype = c1.dtype
    y_win = y_win.astype(dtype)
    z = y_win * zscale                                  # (B, W, C)
    base = z @ silent_sum                               # (B, W)
    u = ub[0] - 0.5 * jnp.sum(y_win * z, axis=-1)
    es = u + base - ub[1]
    d = jnp.matmul(z, delta, precision=_PREC)           # (B, W, N*Km1)
    B, W = es.shape
    N, Km1 = c1.shape
    d = d.reshape(B, W, N, Km1)
    if engine_name == "pallas_ovn":
        from .pallas_viterbi_ovn_mb import ovn_mc_decode_pallas_mb

        x = ovn_mc_decode_pallas_mb(es, d, lp, c1, cx, silent_mask=sil)
    elif engine_name == "nov":
        one = lambda e, dd, s0: _nov_mc_scan(e, dd, lp, c1, silent_start=s0,
                                             with_ll=False)[0]
        x = jax.vmap(one)(es, d, sil)
    elif engine_name == "ov2":
        one = lambda e, dd, s0: _ov2_mc_scan(e, dd, lp, c1, cx,
                                             silent_start=s0,
                                             with_ll=False)[0]
        x = jax.vmap(one)(es, d, sil)
    else:
        one = lambda e, dd, s0: _ovn_mc_scan(e, dd, lp, c1, cx,
                                             silent_start=s0,
                                             with_ll=False)[0]
        x = jax.vmap(one)(es, d, sil)
    S = (1 + N * Km1 + (N * (N - 1) // 2) * Km1 * Km1
         if engine_name != "nov" else 1 + N * Km1)
    return x.astype(jnp.int16) if S <= 32767 else x


def mc_block_decoder(lp, mu, sigmas, *, overlaps: bool, W: int | None = None,
                     block_engine: str = "auto"):
    """Batched windowed MC decoder for overlap_save_decode_long: a callable
    ((B, W, C) raw signal windows, (B,) bool silent-start rows) -> (B, W)
    integer labels — the multi-channel mirror of
    ops/ring_viterbi.ring_block_decoder. With a TPU backend, an overlap
    topology, and a feasible window size W, the blocks decode through the
    fused general-N MC Pallas kernel (pass W to enable the auto check)."""
    from ..parallel.overlap_save import resolve_block_engine_mc

    tables = MCTables(mu, sigmas)
    K, N = np.shape(mu)[0], np.shape(mu)[1]
    lp_j = jnp.asarray(lp)
    dtype = lp_j.dtype
    c1 = jnp.asarray(tables.c1, dtype)
    if W is not None:
        engine = resolve_block_engine_mc(block_engine, overlaps, K, N, W)
    elif block_engine == "pallas":
        raise ValueError("block_engine='pallas' needs the window size W "
                         "to check kernel feasibility — pass W")
    elif block_engine == "auto":
        engine = "ring"
    else:
        engine = block_engine
    if engine == "pallas_ovn" and (not overlaps or N < 2):
        # mirror ring_viterbi.ring_block_decoder / _mc_prepare: an
        # explicitly forced kernel must never silently downgrade
        raise ValueError("block_engine='pallas_ovn' requires an overlap "
                         "topology (overlaps=True) with N >= 2")
    if overlaps and N >= 2 and (N >= 3 or engine == "pallas_ovn"):
        name = "ovn" if engine != "pallas_ovn" else "pallas_ovn"
        cx = jnp.asarray(np.stack([tables.c2[p] for p in sorted(tables.c2)]),
                         dtype)
    elif overlaps and N == 2:
        name = "ov2"
        cx = jnp.asarray(tables.x2[(0, 1)], dtype)
    else:
        # non-overlap — or N < 2, whose overlap space has no pair
        # columns and equals the non-overlap space exactly
        name = "nov"
        cx = jnp.zeros((0,), dtype)
    zscale = jnp.asarray(tables.zscale, dtype)
    ssum = jnp.asarray(tables.silent_sum, dtype)
    ub = jnp.asarray(np.array([tables.u_const, tables.b_sil]), dtype)
    delta = jnp.asarray(tables.delta, dtype)
    return lambda yw, s0: _mc_block_decode_batched(
        yw, s0, lp_j, c1, cx, zscale, ssum, ub, delta, engine_name=name)
