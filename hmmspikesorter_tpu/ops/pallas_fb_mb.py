"""Pallas TPU kernels, multi-block layout: fused Baum-Welch E-step for the
non-overlap ring space — forward, backward, and the EM sufficient
statistics in two kernels, G overlap-save windows per program on the VPU
lane axis.

This is the log-plus sibling of ops/pallas_viterbi_mb.py, applied to the
halo-window EM engine (ops/ring_fb.ring_overlap_forward_backward +
train/em.py fb_mode="overlap"):

  * window (block) axis = VPU lanes (G = 128);
  * ring slots = sublanes, one KP-padded segment per neuron
    (NKP = N * KP rows; KP = 64, so K <= 65);
  * every structural read of the per-neuron ring recursion
    (src/baumwelch.jl:25-98 semantics: stay-silent, onset, ring shift,
    ring exit, exit+onset handoff) is a static slice or a sublane roll.

Kernel 1 (forward) writes only CHUNK-BOUNDARY log-alpha checkpoints
(one (NKP, G) slab per `ch` steps — a ~`ch`x reduction of the alpha HBM
round trip vs streaming every step) plus the per-step logsumexp of
alpha (for the telescoped ll). Kernel 2 walks the chunk grid REVERSED:
it REMATERIALIZES the chunk's `ch` alpha steps in VMEM from the
previous chunk's checkpoint (bit-identical to the forward pass — same
op sequence), maintains beta in VMEM scratch, and accumulates — per
lane, fully fused, nothing (T, S)-shaped ever materialized. The remat
trades one extra alpha sweep (VPU elementwise, cheap) for ~2·(W·NKP·G)
floats of HBM traffic per group (the dominant cost at production
sizes — the classic jax.checkpoint trade, done inside the kernel):

  * gamma occupancies and first/second signal moments per state
    (G1, Gy, Gy2 — the inputs of the mu/sigma M-step,
    src/baumwelch.jl:266-307), window-core-masked so each sample is
    counted by exactly its owner window;
  * the silent-state onset statistics sum_t exp(xi_e(t)) and the
    matching silent-occupancy denominator (the lp M-step,
    src/baumwelch.jl:226-264), with the t and t+1 terms read from the
    SAME window so per-window constants cancel exactly (the invariant
    train/em.py's overlap mode relies on);
  * the terminal beta state of window 0 (for pi = gamma[:, 0]).

Accumulation is linear-space f32: every summand is a normalized
posterior in [0, 1] and per-window step counts are a few thousand, so
the relative error is ~2^-24·sqrt(T) — far below the f32 EM tolerance.

Statistics match train/em.py fb_mode="overlap" to f32 round-off
(tested in interpret mode); the M-step that consumes them is shared.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.logmath import HALF_LOG_2PI

NEG = -3.0e38
G = 128          # windows per program == VPU lanes
KP = 64          # padded ring dimension (K-1 <= 64)
CH = 32          # max window steps per grid chunk (W must divide by this)


def _chunk(N: int) -> int:
    """Steps per grid chunk, sized so the (ch, NKP, G) alpha-slab block
    (plus double buffering) stays well inside VMEM as N grows."""
    return 32 if N <= 3 else (16 if N <= 5 else 8)


def _round_up(x, m):
    return -(-x // m) * m


def _lae(a, b):
    """logaddexp without branching (NEG acts as -inf: exp underflows)."""
    m = jnp.maximum(a, b)
    return m + jnp.log1p(jnp.exp(jnp.minimum(a, b) - m))


def _lse_rows(rows):
    """logsumexp over a python list of (1, G) rows — unrolled, so Mosaic
    never sees an ADD reduction over a small offset-layout tensor (its
    shape-invariant mode rejects those)."""
    m = rows[0]
    for r in rows[1:]:
        m = jnp.maximum(m, r)
    s = jnp.exp(rows[0] - m)
    for r in rows[1:]:
        s = s + jnp.exp(r - m)
    return m + jnp.log(s)


def _make_alpha_step(N, Km1, lpn, self_w, stay_w, swap_w, subk, maskk):
    """One forward log-alpha update (vs, vb, es, eb) -> (vs', vb') — the
    per-neuron ring recursion with static-slice/sublane-roll reads only.
    Shared verbatim by the forward kernel and the backward kernel's
    rematerialization, so the recomputed alpha is bit-identical."""

    def fstep(vs, vb, es, eb):
        # per-neuron ring-end rows, static slices (1, G)
        ends = [vb[n * KP + Km1 - 1 : n * KP + Km1, :] for n in range(N)]
        new_vs = _lae(vs + self_w, _lse_rows(ends) + stay_w) + es
        first = []
        for n in range(N):
            on = vs + lpn[n] + stay_w
            others = [ends[m] for m in range(N) if m != n]
            if others:
                sw = _lse_rows(others) + swap_w
                first.append(_lae(on, sw + lpn[n]))
            else:
                first.append(on)
        rolled = pltpu.roll(vb, 1, axis=0) + stay_w
        firstx = jnp.concatenate(
            [jnp.broadcast_to(first[n], (KP, G)) for n in range(N)],
            axis=0)
        new_vb = jnp.where(subk == 0, firstx, rolled)
        new_vb = jnp.where(maskk, new_vb + eb, NEG)
        return new_vs, new_vb

    return fstep


def _make_fwd_kernel(N: int, Km1: int, ch: int, stream_em: bool = False):
    """Forward kernel factory. stream_em=False: fused single-channel
    Gaussian emission computed from the raw y window. stream_em=True:
    the multi-channel front-end — per-step emissions are READ from
    precomputed stream windows (es + KP-padded eb slabs, the factorized
    channel collapse of core/emission_mc) instead of computed; every
    other op is identical, so the dynamics stay single-source."""
    NKP = N * KP

    def kernel(*args):
        if stream_em:
            (es_ref, eb_ref, consts_ref, lpv_ref,
             cps_ref, cpb_ref, la_ref, as_s, ab_s) = args
        else:
            (y_ref, consts_ref, lpv_ref, bm_ref,
             cps_ref, cpb_ref, la_ref, as_s, ab_s) = args
        c = pl.program_id(1)
        lpz = consts_ref[0, 0]
        self_w = N * lpz
        stay_w = (N - 1) * lpz
        swap_w = (N - 2) * lpz
        lpn = [lpv_ref[n : n + 1, :] for n in range(N)]        # (1, G) each

        subk = jax.lax.broadcasted_iota(jnp.int32, (NKP, G), 0) % KP
        maskk = subk < Km1
        fstep = _make_alpha_step(N, Km1, lpn, self_w, stay_w, swap_w,
                                 subk, maskk)

        if stream_em:
            def em_at(s):
                return (es_ref[0, s : s + 1, :],
                        eb_ref[0, s * NKP : (s + 1) * NKP, :])
        else:
            log_sigma = consts_ref[0, 1]
            inv_2s2 = consts_ref[0, 2]
            silent_mean = consts_ref[0, 3]
            econst = -HALF_LOG_2PI - log_sigma
            bm = bm_ref[...]

            def em_at(s):
                y_t = y_ref[0, s : s + 1, :]
                es = econst - (y_t - silent_mean) ** 2 * inv_2s2  # (1, G)
                eb = econst - (y_t - bm) ** 2 * inv_2s2           # (NKP, G)
                return es, eb

        def lse_all(a_s, a_b):
            m = jnp.maximum(jnp.max(a_b, axis=0, keepdims=True), a_s)
            return m + jnp.log(
                jnp.sum(jnp.exp(a_b - m), axis=0, keepdims=True)
                + jnp.exp(a_s - m))

        for s in range(ch):
            def step(s=s):
                es, eb = em_at(s)
                new_vs, new_vb = fstep(as_s[0:1, :], ab_s[...], es, eb)
                as_s[0:1, :] = new_vs
                ab_s[...] = new_vb
                la_ref[0, s : s + 1, :] = lse_all(new_vs, new_vb)

            if s == 0:
                @pl.when(c == 0)
                def _init():
                    es, eb = em_at(0)
                    a_b = jnp.where(maskk, eb, NEG)
                    as_s[0:1, :] = es
                    ab_s[...] = a_b
                    la_ref[0, 0:1, :] = lse_all(es, a_b)

                @pl.when(c > 0)
                def _():
                    step()
            else:
                step()

        # chunk-boundary checkpoint: alpha after this chunk's last step —
        # the only alpha state that leaves VMEM (backward rematerializes
        # the per-step slabs from it). The silent row is broadcast to an
        # 8-row slab: Mosaic requires sublane-dim blocks divisible by 8.
        cps_ref[0, :, :] = jnp.broadcast_to(as_s[0:1, :], (8, G))
        cpb_ref[0, :, :] = ab_s[...]

    return kernel


def _make_bwd_kernel(N: int, Km1: int, Wc: int, ch: int,
                     stream_em: bool = False, C: int = 1):
    """Backward kernel factory. stream_em selects the emission source
    (fused single-channel compute vs precomputed MC stream reads, exactly
    as in _make_fwd_kernel); C is the number of moment channels — the
    gamma first/second signal moments are accumulated per channel from
    the yc_ref rows (for the single-channel build yc_ref IS y_ref and
    C=1, reproducing the original op sequence and accumulator layout
    verbatim). Silent accumulator rows: [occ | y_c... | y_c^2... | Xd]."""
    NKP = N * KP

    def kernel(*args):
        if stream_em:
            (es_ref, eb_ref, yc_ref, cps_ref, cpb_ref, consts_ref,
             lpv_ref, bounds_ref, s0_ref, s1_ref, s2_ref, sil_ref, xx_ref,
             b0s_ref, b0b_ref,
             bs_s, bb_s, ems_s, emb_s, g_s,
             a0_s, a1_s, a2_s, asil_s, ax_s, ral_s, ral_b) = args
        else:
            (y_ref, cps_ref, cpb_ref, consts_ref, lpv_ref, bm_ref,
             bounds_ref, s0_ref, s1_ref, s2_ref, sil_ref, xx_ref,
             b0s_ref, b0b_ref,
             bs_s, bb_s, ems_s, emb_s, g_s,
             a0_s, a1_s, a2_s, asil_s, ax_s, ral_s, ral_b) = args
            yc_ref = y_ref
        c = pl.program_id(1)
        cc = Wc - 1 - c                       # actual chunk index
        lpz = consts_ref[0, 0]
        self_w = N * lpz
        stay_w = (N - 1) * lpz
        swap_w = (N - 2) * lpz
        lpn = [lpv_ref[n : n + 1, :] for n in range(N)]        # (1, G) each

        subk = jax.lax.broadcasted_iota(jnp.int32, (NKP, G), 0) % KP
        maskk = subk < Km1
        endrow = subk == Km1 - 1
        fstep = _make_alpha_step(N, Km1, lpn, self_w, stay_w, swap_w,
                                 subk, maskk)

        if stream_em:
            def em_at(s):
                return (es_ref[0, s : s + 1, :],
                        eb_ref[0, s * NKP : (s + 1) * NKP, :])
        else:
            log_sigma = consts_ref[0, 1]
            inv_2s2 = consts_ref[0, 2]
            silent_mean = consts_ref[0, 3]
            econst = -HALF_LOG_2PI - log_sigma
            bm = bm_ref[...]

            def em_at(s):
                y_t = y_ref[0, s : s + 1, :]
                es = econst - (y_t - silent_mean) ** 2 * inv_2s2
                eb = econst - (y_t - bm) ** 2 * inv_2s2
                return es, eb

        core_lo = bounds_ref[0, 0:1, :]                       # (1, G)
        core_hi = bounds_ref[0, 1:2, :]
        xi_hi = bounds_ref[0, 2:3, :]

        silr = asil_s.shape[0]
        zero1 = jnp.zeros((1, G), jnp.float32)
        zerob = jnp.zeros((NKP, G), jnp.float32)

        @pl.when(c == 0)
        def _zero_accs():
            a0_s[...] = zerob
            a1_s[...] = jnp.zeros((C * NKP, G), jnp.float32)
            a2_s[...] = jnp.zeros((C * NKP, G), jnp.float32)
            asil_s[...] = jnp.zeros((silr, G), jnp.float32)
            ax_s[...] = jnp.zeros((8, G), jnp.float32)

        # --- rematerialize this chunk's ch alpha steps into VMEM from the
        # previous chunk's checkpoint (chunk 0 re-derives the t=0
        # emission-only init) — bit-identical to the forward pass: the
        # update is the same _make_alpha_step closure
        for s in range(ch):
            if s == 0:
                @pl.when(c == Wc - 1)         # actual chunk 0
                def _remat_init():
                    es0, eb0 = em_at(0)
                    ral_s[0:1, :] = es0
                    ral_b[0:NKP, :] = jnp.where(maskk, eb0, NEG)

                @pl.when(c < Wc - 1)
                def _remat_carry():
                    es0, eb0 = em_at(0)
                    nvs, nvb = fstep(cps_ref[0, 0:1, :], cpb_ref[0, :, :],
                                     es0, eb0)
                    ral_s[0:1, :] = nvs
                    ral_b[0:NKP, :] = nvb
            else:
                es_r, eb_r = em_at(s)
                nvs, nvb = fstep(ral_s[s - 1 : s, :],
                                 ral_b[(s - 1) * NKP : s * NKP, :],
                                 es_r, eb_r)
                ral_s[s : s + 1, :] = nvs
                ral_b[s * NKP : (s + 1) * NKP, :] = nvb

        for s in range(ch - 1, -1, -1):
            def tail(s, t, new_bs, new_bb, a_s, a_b, es, eb, xim):
                # g_t and the gamma statistics (owner-core masked)
                tot = a_b + new_bb
                sil = a_s + new_bs
                m = jnp.maximum(jnp.max(tot, axis=0, keepdims=True), sil)
                g_t = m + jnp.log(
                    jnp.sum(jnp.exp(tot - m), axis=0, keepdims=True)
                    + jnp.exp(sil - m))
                gb = jnp.exp(tot - g_t)                       # (NKP, G)
                gs = jnp.exp(sil - g_t)                       # (1, G)
                cm = (t >= core_lo) & (t < core_hi)
                gbm = jnp.where(cm, gb, 0.0)
                gsm = jnp.where(cm, gs, 0.0)
                a0_s[...] = a0_s[...] + gbm
                for q in range(C):
                    y_q = yc_ref[0, s * C + q : s * C + q + 1, :]
                    a1_s[q * NKP : (q + 1) * NKP, :] = (
                        a1_s[q * NKP : (q + 1) * NKP, :] + gbm * y_q)
                    a2_s[q * NKP : (q + 1) * NKP, :] = (
                        a2_s[q * NKP : (q + 1) * NKP, :]
                        + gbm * (y_q * y_q))
                    asil_s[1 + q : 2 + q, :] = (
                        asil_s[1 + q : 2 + q, :] + gsm * y_q)
                    asil_s[1 + C + q : 2 + C + q, :] = (
                        asil_s[1 + C + q : 2 + C + q, :]
                        + gsm * (y_q * y_q))
                asil_s[0:1, :] = asil_s[0:1, :] + gsm
                asil_s[1 + 2 * C : 2 + 2 * C, :] = (
                    asil_s[1 + 2 * C : 2 + 2 * C, :]
                    + jnp.where(xim, gs, 0.0))
                # caches for the next (earlier-t) step
                bs_s[0:1, :] = new_bs
                bb_s[...] = new_bb
                ems_s[0:1, :] = es
                emb_s[...] = eb
                g_s[0:1, :] = g_t

            def step(s=s):
                t = cc * ch + s
                es, eb = em_at(s)
                a_s = ral_s[s : s + 1, :]
                a_b = ral_b[s * NKP : (s + 1) * NKP, :]
                xim = (t >= core_lo) & (t < xi_hi)

                bs = bs_s[0:1, :]
                bb = bb_s[...]
                emsp = ems_s[0:1, :]                          # em at t+1
                embp = emb_s[...]
                gp = g_s[0:1, :]                              # g at t+1

                # per-neuron onset-slot rows, static slices (1, G)
                bon = [bb[n * KP : n * KP + 1, :] for n in range(N)]
                eon = [embp[n * KP : n * KP + 1, :] for n in range(N)]

                # onset xi statistics: alpha_t[sil] + w_e + beta_{t+1}[on]
                # + em_{t+1}[on] - g_{t+1}, accumulated in linear space
                for n in range(N):
                    xi = a_s + lpn[n] + stay_w + bon[n] + eon[n] - gp
                    ax_s[n : n + 1, :] = ax_s[n : n + 1, :] + jnp.where(
                        xim, jnp.exp(xi), 0.0)

                # beta update (uses the t+1 emissions)
                onset_terms = [bon[n] + eon[n] + lpn[n] + stay_w
                               for n in range(N)]
                new_bs = _lae(bs + emsp + self_w, _lse_rows(onset_terms))
                rolledb = pltpu.roll(bb + embp, NKP - 1, axis=0) + stay_w
                exit_term = []
                for n in range(N):
                    others = [bon[m] + eon[m] + lpn[m]
                              for m in range(N) if m != n]
                    if others:
                        each = _lse_rows(others) + swap_w
                        exit_term.append(_lae(bs + emsp + stay_w, each))
                    else:
                        exit_term.append(bs + emsp + stay_w)
                exitx = jnp.concatenate(
                    [jnp.broadcast_to(exit_term[n], (KP, G))
                     for n in range(N)], axis=0)
                new_bb = jnp.where(endrow, exitx, rolledb)
                new_bb = jnp.where(maskk, new_bb, NEG)
                tail(s, t, new_bs, new_bb, a_s, a_b, es, eb, xim)

            if s == ch - 1:
                @pl.when(c == 0)
                def _init():
                    # t = W-1: terminal beta = 0 (exact for the last
                    # window, which ends at the real T)
                    t = cc * ch + s
                    es, eb = em_at(s)
                    a_s = ral_s[s : s + 1, :]
                    a_b = ral_b[s * NKP : (s + 1) * NKP, :]
                    xim = (t >= core_lo) & (t < xi_hi)
                    new_bs = zero1
                    new_bb = jnp.where(maskk, zerob, NEG)
                    tail(s, t, new_bs, new_bb, a_s, a_b, es, eb, xim)

                @pl.when(c > 0)
                def _():
                    step()
            else:
                step()

        @pl.when(c == Wc - 1)
        def _final():
            s0_ref[0] = a0_s[...]
            s1_ref[0] = a1_s[...]
            s2_ref[0] = a2_s[...]
            sil_ref[0] = asil_s[...]
            xx_ref[0] = ax_s[...]
            b0s_ref[0] = bs_s[0:1, :]
            b0b_ref[0] = bb_s[...]

    return kernel


def _em_window_geom(T, L, H, B, W):
    """Host-side window geometry: per-window start sample, the edge rows
    clamped to the real signal edges, and the per-window core/xi bounds in
    window coordinates (every sample owned by exactly one window)."""
    starts = np.maximum(np.arange(B) * L - H, 0)
    starts[-1] = T - W
    edge = {0: 0, B - 1: T - W}
    if B >= 3 and (B - 1) * L + H > T:
        edge[B - 2] = T - W
        starts[B - 2] = T - W
    core_lo = np.arange(B) * L - starts
    core_hi = np.minimum((np.arange(B) + 1) * L, T) - starts
    xi_hi = core_hi.copy()
    xi_hi[B - 1] -= 1                        # xi is defined for t <= T-2
    return starts, edge, core_lo, core_hi, xi_hi


def _em_window_1d(x, *, T, L, H, B, W, edge):
    """(T,) -> (B, W) halo windows (pad/reshape trick), edge rows clamped
    to the real signal edges."""
    Tp = B * L
    x_ext = jnp.pad(x, (H, Tp - T + (L - H)))
    A = x_ext.reshape(B + 1, L)
    xw = jnp.concatenate([A[:B], A[1:, : 2 * H]], axis=1)      # (B, W)
    for b, st in edge.items():
        xw = xw.at[b].set(jax.lax.dynamic_slice_in_dim(x, st, W))
    return xw


def _em_stats_from_windows(y_win, core_lo, core_hi, xi_hi, lp, mu, sigma,
                           *, interpret=False):
    """Run the fused EM kernels over prebuilt halo windows.

    The window construction is the caller's: the single-device path
    (`_overlap_em_stats_impl`) clamps edge windows to the global signal
    edges, while the time-sharded path (parallel/sharded_em.py,
    fb_mode="overlap_pallas") builds per-device windows from a halo
    ppermute and clamps only at the mesh edges — the kernels and the
    per-window core-bounds mechanism are identical, so the two paths
    cannot drift.

    Args:
      y_win: (B, W) f32 halo windows, W = L + 2H a multiple of the chunk.
      core_lo/core_hi/xi_hi: (B,) int32 per-window core bounds in window
        coordinates (dynamic — may depend on a mesh device index).

    Returns (G1, Gy, Gy2, X, Xd, beta0, endc, pre): the linear-space
    per-state sums over this window batch, the window-0 terminal beta
    (log space), and the per-window telescoped-ll edge reads
    (endc = lse(alpha) at core_hi-1, pre = at core_lo-1; a core_lo of 0
    yields pre = 0 — the absolute first-window term).
    """
    B, W = y_win.shape
    K, N = mu.shape
    Km1 = K - 1
    NKP = N * KP
    dtype = jnp.float32

    lp = jnp.asarray(lp, dtype)
    mu = jnp.asarray(mu, dtype)
    sigma = jnp.asarray(sigma, dtype)
    lpz = jnp.log1p(-jnp.exp(jnp.sum(lp)))
    silent_mean = jnp.sum(mu[0])
    consts = jnp.stack([lpz, jnp.log(sigma),
                        1.0 / (2.0 * sigma * sigma), silent_mean,
                        0.0, 0.0, 0.0, 0.0])[None, :]
    lpv = jnp.zeros((8, 1), dtype).at[:N, 0].set(lp)
    lpv = jnp.broadcast_to(lpv, (8, G))
    # per-state body means in segment layout: row n*KP + k = mean of
    # neuron n at ring position k+1 (ops/ring_fb._emission_fns)
    body = mu[1:].T + (silent_mean - mu[0])[:, None]           # (N, Km1)
    bmg = jnp.zeros((N, KP), dtype).at[:, :Km1].set(body)
    bm = jnp.broadcast_to(bmg.reshape(NKP, 1), (NKP, G))

    Bg = _round_up(B, G) // G
    Bp = Bg * G
    ch = _chunk(N)
    Wc = W // ch

    ypad = jnp.zeros((Bp, W), dtype).at[:B].set(y_win.astype(dtype))
    y_in = ypad.reshape(Bg, G, W).transpose(0, 2, 1)           # (Bg, W, G)
    bvals = jnp.stack([jnp.asarray(core_lo, jnp.int32),
                       jnp.asarray(core_hi, jnp.int32),
                       jnp.asarray(xi_hi, jnp.int32)], axis=1)  # (B, 3)
    bpad = jnp.zeros((Bp, 3), jnp.int32).at[:B].set(bvals)      # padded rows:
    bounds = bpad.reshape(Bg, G, 3).transpose(0, 2, 1)          # lo=hi=0 ->
    #                                                             no stats

    fkernel = _make_fwd_kernel(N, Km1, ch)
    fin_specs = [
        pl.BlockSpec((1, ch, G), lambda b, c: (b, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8), lambda b, c: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((8, G), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((NKP, G), lambda b, c: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    fout_specs = [
        pl.BlockSpec((1, 8, G), lambda b, c: (b, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NKP, G), lambda b, c: (b, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ch, G), lambda b, c: (b, c, 0),
                     memory_space=pltpu.VMEM),
    ]
    fout_shape = [
        jax.ShapeDtypeStruct((Bg, Wc * 8, G), jnp.float32),
        jax.ShapeDtypeStruct((Bg, Wc * NKP, G), jnp.float32),
        jax.ShapeDtypeStruct((Bg, W, G), jnp.float32),
    ]
    fscratch = [pltpu.VMEM((8, G), jnp.float32),
                pltpu.VMEM((NKP, G), jnp.float32)]
    cps, cpb, la = pl.pallas_call(
        fkernel, out_shape=fout_shape, grid=(Bg, Wc), in_specs=fin_specs,
        out_specs=fout_specs, scratch_shapes=fscratch, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(y_in, consts, lpv, bm)

    bkernel = _make_bwd_kernel(N, Km1, Wc, ch)
    rev = lambda b, c: (b, Wc - 1 - c, 0)
    # chunk cc = Wc-1-c rematerializes from checkpoint cc-1; the clamp at
    # cc == 0 keeps the index in range (that block is DMA'd but unread —
    # chunk 0 re-derives the t=0 init instead)
    rev_prev = lambda b, c: (b, jnp.maximum(Wc - 2 - c, 0), 0)
    bin_specs = [
        pl.BlockSpec((1, ch, G), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, G), rev_prev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NKP, G), rev_prev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8), lambda b, c: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((8, G), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((NKP, G), lambda b, c: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, G), lambda b, c: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    bout_specs = [
        pl.BlockSpec((1, NKP, G), lambda b, c: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NKP, G), lambda b, c: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NKP, G), lambda b, c: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, G), lambda b, c: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, G), lambda b, c: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, G), lambda b, c: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NKP, G), lambda b, c: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    bout_shape = [
        jax.ShapeDtypeStruct((Bg, NKP, G), jnp.float32),
        jax.ShapeDtypeStruct((Bg, NKP, G), jnp.float32),
        jax.ShapeDtypeStruct((Bg, NKP, G), jnp.float32),
        jax.ShapeDtypeStruct((Bg, 8, G), jnp.float32),
        jax.ShapeDtypeStruct((Bg, 8, G), jnp.float32),
        jax.ShapeDtypeStruct((Bg, 1, G), jnp.float32),
        jax.ShapeDtypeStruct((Bg, NKP, G), jnp.float32),
    ]
    bscratch = [
        pltpu.VMEM((8, G), jnp.float32),       # beta silent
        pltpu.VMEM((NKP, G), jnp.float32),     # beta body
        pltpu.VMEM((8, G), jnp.float32),       # em silent cache (t+1)
        pltpu.VMEM((NKP, G), jnp.float32),     # em body cache (t+1)
        pltpu.VMEM((8, G), jnp.float32),       # g cache (t+1)
        pltpu.VMEM((NKP, G), jnp.float32),     # acc S0 body
        pltpu.VMEM((NKP, G), jnp.float32),     # acc S1 body
        pltpu.VMEM((NKP, G), jnp.float32),     # acc S2 body
        pltpu.VMEM((8, G), jnp.float32),       # acc silent S0/S1/S2/Xd
        pltpu.VMEM((8, G), jnp.float32),       # acc X (onset edges)
        pltpu.VMEM((ch, G), jnp.float32),      # remat alpha silent
        pltpu.VMEM((ch * NKP, G), jnp.float32),  # remat alpha body
    ]
    s0, s1, s2, sil, xx, b0s, b0b = pl.pallas_call(
        bkernel, out_shape=bout_shape, grid=(Bg, Wc), in_specs=bin_specs,
        out_specs=bout_specs, scratch_shapes=bscratch, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(y_in, cps, cpb, consts, lpv, bm, bounds)

    # --- combine: per-state sufficient statistics in the flat layout
    # [silent | body ravel (N, K-1) n-major] of core/state_space.py
    def body_sum(x):
        return jnp.sum(x, axis=(0, 2)).reshape(N, KP)[:, :Km1].reshape(-1)

    sil_sum = jnp.sum(sil, axis=(0, 2))                        # (8,)
    G1 = jnp.concatenate([sil_sum[0:1], body_sum(s0)])
    Gy = jnp.concatenate([sil_sum[1:2], body_sum(s1)])
    Gy2 = jnp.concatenate([sil_sum[2:3], body_sum(s2)])
    Xd = sil_sum[3]
    X = jnp.sum(xx, axis=(0, 2))[:N]                           # (N,)

    # beta at t=0 of window 0 (lane 0 of program 0), flat layout
    beta0 = jnp.concatenate(
        [b0s[0, :, 0], b0b[0, :, 0].reshape(N, KP)[:, :Km1].reshape(-1)])

    # per-window telescoped-ll edge reads from the per-step lse(alpha)
    # output (ring_overlap_forward_backward's pre/endc); a core_lo of 0
    # matches no position -> pre = 0 (the absolute first-window term)
    la_bm = la.transpose(0, 2, 1).reshape(Bp, W)[:B]           # (B, W)
    pos = jnp.arange(W)[None, :]
    endc = jnp.sum(jnp.where(pos == (jnp.asarray(core_hi) - 1)[:, None],
                             la_bm, 0.0), axis=1)
    pre = jnp.sum(jnp.where(pos == (jnp.asarray(core_lo) - 1)[:, None],
                            la_bm, 0.0), axis=1)
    return G1, Gy, Gy2, X, Xd, beta0, endc, pre


@partial(jax.jit, static_argnames=("L", "H", "interpret"))
def _overlap_em_stats_impl(y, lp, mu, sigma, *, L, H, interpret=False):
    T = y.shape[0]
    K, N = mu.shape
    B = -(-T // L)
    W = L + 2 * H

    y = jnp.asarray(y, jnp.float32)
    # windows with clamped edge rows (no rolling: per-lane core bounds
    # keep every sample owned by exactly one window, in that window's own
    # coordinates) — same construction as ring_overlap_forward_backward
    starts, edge, core_lo, core_hi, xi_hi = _em_window_geom(T, L, H, B, W)
    y_win = _em_window_1d(y, T=T, L=L, H=H, B=B, W=W, edge=edge)
    G1, Gy, Gy2, X, Xd, beta0, endc, pre = _em_stats_from_windows(
        y_win, core_lo, core_hi, xi_hi, lp, mu, sigma, interpret=interpret)
    # telescoped ll: absolute first-window term + same-window differences
    ll = endc[0] + jnp.sum(endc[1:] - pre[1:])
    return G1, Gy, Gy2, X, Xd, beta0, ll


def overlap_em_stats_pallas(y, lp, mu, sigma, *, L: int, H: int,
                            interpret: bool = False):
    """Fused-kernel EM sufficient statistics over halo windows.

    Returns (G1, Gy, Gy2, X, Xd, beta0, ll): per-state occupancy and
    signal moments (flat [silent | body] layout, linear space), the
    linear-space onset-edge xi sums X (N,) with silent-occupancy
    denominator Xd, the terminal beta of window 0 (log space, for pi),
    and the telescoped sequence ll. Requires the non-overlap topology,
    K <= KP + 1, N <= 8, W = L + 2H a multiple of CH, and at least two
    windows.
    """
    T = len(y)
    K, N = np.shape(mu)
    W = L + 2 * H
    if K - 1 > KP:
        raise ValueError(f"pallas EM kernel supports K <= {KP + 1}")
    if N > 8:
        raise ValueError("pallas EM kernel supports N <= 8")
    if W % CH != 0:
        raise ValueError(f"W = L + 2H = {W} must be a multiple of {CH}")
    if L < 2 * H:
        raise ValueError("need L >= 2H")
    if T < W or T <= L:
        raise ValueError("signal shorter than two windows")
    return _overlap_em_stats_impl(y, lp, mu, sigma, L=L, H=H,
                                  interpret=interpret)


# --- multi-channel front-end: same kernels, stream emissions + per-channel
# moments. The (T, C) channel axis is collapsed OUTSIDE the kernels by the
# factorized-stream projection (train/em_mc._mc_streams_dense semantics);
# the kernels consume es/eb stream windows and accumulate the gamma
# moments against each channel's raw samples (yc rows), producing exactly
# the per-channel sufficient statistics the MC M-step consumes.

# raised scoped ceiling + measured live-temporary slop: single-sourced
# with the decode kernels so the two cannot drift
from .pallas_viterbi_ovn_mb import VMEM_LIMIT, VMEM_SLOP_MC


def overlap_em_mc_vmem_bytes(N: int, K: int, C: int) -> int:
    """Per-program VMEM estimate for the MC backward kernel (the larger of
    the two): stream/checkpoint/yc input blocks (double-buffered), the
    per-channel moment accumulators + output blocks, caches, and the remat
    alpha slab."""
    if K - 1 > KP:
        raise ValueError(f"pallas EM kernel supports K <= {KP + 1}")
    NKP = N * KP
    ch = _chunk(N)
    rows = (2 * (ch * NKP + ch + ch * C)       # es/eb/yc in, double-buffered
            + 2 * (8 + NKP)                    # checkpoint blocks
            + NKP + 2 * C * NKP                # s0/s1/s2 output blocks
            + _round_up(2 * C + 2, 8) + 8 + 1 + NKP   # sil/xx/b0 outputs
            + 2 * NKP + 24                     # beta/em/g caches
            + NKP + 2 * C * NKP + _round_up(2 * C + 2, 8) + 8   # accumulators
            + ch + ch * NKP)                   # remat alpha
    return rows * G * 4


def overlap_em_mc_vmem_ok(N: int, K: int, C: int,
                          ceiling: int | None = None) -> bool:
    if ceiling is None:
        from .pallas_viterbi_ovn_mb import _gate_ceiling

        ceiling = _gate_ceiling()
    return overlap_em_mc_vmem_bytes(N, K, C) * VMEM_SLOP_MC <= ceiling


@partial(jax.jit, static_argnames=("L", "H", "interpret"))
def _overlap_em_stats_mc_impl(es, eb, yc, lp, *, L, H, interpret=False):
    """es (T,) silent log-emissions; eb (T, N, K-1) body log-emissions;
    yc (T, C) raw recording; lp (N,). Returns the MC sufficient statistics
    (see overlap_em_stats_pallas_mc)."""
    T, C = yc.shape
    _, N, Km1 = eb.shape
    NKP = N * KP
    B = -(-T // L)
    W = L + 2 * H
    dtype = jnp.float32
    silr = _round_up(2 * C + 2, 8)

    es = jnp.asarray(es, dtype)
    eb = jnp.asarray(eb, dtype)
    yc = jnp.asarray(yc, dtype)
    lp = jnp.asarray(lp, dtype)
    lpz = jnp.log1p(-jnp.exp(jnp.sum(lp)))
    consts = jnp.stack([lpz] + [jnp.zeros(())] * 7)[None, :].astype(dtype)
    lpv = jnp.zeros((8, 1), dtype).at[:N, 0].set(lp)
    lpv = jnp.broadcast_to(lpv, (8, G))

    starts, edge, core_lo, core_hi, xi_hi = _em_window_geom(T, L, H, B, W)
    win = partial(_em_window_1d, T=T, L=L, H=H, B=B, W=W, edge=edge)
    es_w = win(es)                                             # (B, W)
    eb_kp = jnp.zeros((T, N, KP), dtype).at[:, :, :Km1].set(eb)
    eb_w = jax.vmap(win)(eb_kp.reshape(T, NKP).T)              # (NKP, B, W)
    yc_w = jax.vmap(win)(yc.T)                                 # (C, B, W)

    Bg = _round_up(B, G) // G
    Bp = Bg * G
    ch = _chunk(N)
    Wc = W // ch

    es_in = (jnp.zeros((Bp, W), dtype).at[:B].set(es_w)
             .reshape(Bg, G, W).transpose(0, 2, 1))            # (Bg, W, G)
    eb_in = (jnp.zeros((Bp, W, NKP), dtype)
             .at[:B].set(eb_w.transpose(1, 2, 0))
             .reshape(Bg, G, W, NKP).transpose(0, 2, 3, 1)
             .reshape(Bg, W * NKP, G))
    yc_in = (jnp.zeros((Bp, W, C), dtype)
             .at[:B].set(yc_w.transpose(1, 2, 0))
             .reshape(Bg, G, W, C).transpose(0, 2, 3, 1)
             .reshape(Bg, W * C, G))
    bnp = np.zeros((Bp, 3), np.int32)
    bnp[:B, 0] = core_lo
    bnp[:B, 1] = core_hi
    bnp[:B, 2] = xi_hi
    bounds = jnp.asarray(bnp).reshape(Bg, G, 3).transpose(0, 2, 1)

    fkernel = _make_fwd_kernel(N, Km1, ch, stream_em=True)
    fin_specs = [
        pl.BlockSpec((1, ch, G), lambda b, c: (b, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ch * NKP, G), lambda b, c: (b, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8), lambda b, c: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((8, G), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
    ]
    fout_specs = [
        pl.BlockSpec((1, 8, G), lambda b, c: (b, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NKP, G), lambda b, c: (b, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ch, G), lambda b, c: (b, c, 0),
                     memory_space=pltpu.VMEM),
    ]
    fout_shape = [
        jax.ShapeDtypeStruct((Bg, Wc * 8, G), jnp.float32),
        jax.ShapeDtypeStruct((Bg, Wc * NKP, G), jnp.float32),
        jax.ShapeDtypeStruct((Bg, W, G), jnp.float32),
    ]
    fscratch = [pltpu.VMEM((8, G), jnp.float32),
                pltpu.VMEM((NKP, G), jnp.float32)]
    cps, cpb, la = pl.pallas_call(
        fkernel, out_shape=fout_shape, grid=(Bg, Wc), in_specs=fin_specs,
        out_specs=fout_specs, scratch_shapes=fscratch, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
    )(es_in, eb_in, consts, lpv)

    bkernel = _make_bwd_kernel(N, Km1, Wc, ch, stream_em=True, C=C)
    rev = lambda b, c: (b, Wc - 1 - c, 0)
    rev_prev = lambda b, c: (b, jnp.maximum(Wc - 2 - c, 0), 0)
    bin_specs = [
        pl.BlockSpec((1, ch, G), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ch * NKP, G), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ch * C, G), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, G), rev_prev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NKP, G), rev_prev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8), lambda b, c: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((8, G), lambda b, c: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, G), lambda b, c: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    bout_specs = [
        pl.BlockSpec((1, NKP, G), lambda b, c: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C * NKP, G), lambda b, c: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C * NKP, G), lambda b, c: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, silr, G), lambda b, c: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, G), lambda b, c: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, G), lambda b, c: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, NKP, G), lambda b, c: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    bout_shape = [
        jax.ShapeDtypeStruct((Bg, NKP, G), jnp.float32),
        jax.ShapeDtypeStruct((Bg, C * NKP, G), jnp.float32),
        jax.ShapeDtypeStruct((Bg, C * NKP, G), jnp.float32),
        jax.ShapeDtypeStruct((Bg, silr, G), jnp.float32),
        jax.ShapeDtypeStruct((Bg, 8, G), jnp.float32),
        jax.ShapeDtypeStruct((Bg, 1, G), jnp.float32),
        jax.ShapeDtypeStruct((Bg, NKP, G), jnp.float32),
    ]
    bscratch = [
        pltpu.VMEM((8, G), jnp.float32),         # beta silent
        pltpu.VMEM((NKP, G), jnp.float32),       # beta body
        pltpu.VMEM((8, G), jnp.float32),         # em silent cache (t+1)
        pltpu.VMEM((NKP, G), jnp.float32),       # em body cache (t+1)
        pltpu.VMEM((8, G), jnp.float32),         # g cache (t+1)
        pltpu.VMEM((NKP, G), jnp.float32),       # acc S0 body
        pltpu.VMEM((C * NKP, G), jnp.float32),   # acc S1 body per channel
        pltpu.VMEM((C * NKP, G), jnp.float32),   # acc S2 body per channel
        pltpu.VMEM((silr, G), jnp.float32),      # acc silent per channel
        pltpu.VMEM((8, G), jnp.float32),         # acc X (onset edges)
        pltpu.VMEM((ch, G), jnp.float32),        # remat alpha silent
        pltpu.VMEM((ch * NKP, G), jnp.float32),  # remat alpha body
    ]
    s0, s1, s2, sil, xx, b0s, b0b = pl.pallas_call(
        bkernel, out_shape=bout_shape, grid=(Bg, Wc), in_specs=bin_specs,
        out_specs=bout_specs, scratch_shapes=bscratch, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
    )(es_in, eb_in, yc_in, cps, cpb, consts, lpv, bounds)

    # --- combine into the flat layout [silent | body ravel n-major]
    def body_sum(x):
        return jnp.sum(x, axis=(0, 2)).reshape(N, KP)[:, :Km1].reshape(-1)

    sil_sum = jnp.sum(sil, axis=(0, 2))                        # (silr,)
    G1 = jnp.concatenate([sil_sum[0:1], body_sum(s0)])
    Gy = jnp.stack([
        jnp.concatenate([sil_sum[1 + q : 2 + q],
                         body_sum(s1[:, q * NKP : (q + 1) * NKP, :])])
        for q in range(C)])                                    # (C, S)
    Gy2 = jnp.stack([
        jnp.concatenate([sil_sum[1 + C + q : 2 + C + q],
                         body_sum(s2[:, q * NKP : (q + 1) * NKP, :])])
        for q in range(C)])
    Xd = sil_sum[1 + 2 * C]
    X = jnp.sum(xx, axis=(0, 2))[:N]                           # (N,)

    beta0 = jnp.concatenate(
        [b0s[0, :, 0], b0b[0, :, 0].reshape(N, KP)[:, :Km1].reshape(-1)])

    la_bm = la.transpose(0, 2, 1).reshape(Bp, W)[:B]           # (B, W)
    pos = jnp.arange(W)[None, :]
    endc = jnp.sum(jnp.where(pos == (core_hi - 1)[:, None], la_bm, 0.0),
                   axis=1)
    pre = jnp.sum(jnp.where(pos == (core_lo - 1)[:, None], la_bm, 0.0),
                  axis=1)
    ll = endc[0] + jnp.sum(endc[1:] - pre[1:])

    return G1, Gy, Gy2, X, Xd, beta0, ll


def overlap_em_stats_pallas_mc(es, eb, yc, lp, *, L: int, H: int,
                               interpret: bool = False):
    """Fused-kernel MC EM sufficient statistics over halo windows.

    Inputs are the factorized MC emission streams (es (T,) silent, eb
    (T, N, K-1) body — train/em_mc._mc_streams_dense semantics, computed
    in-graph by the caller so mu/sigmas may be EM-loop tracers) plus the
    raw (T, C) recording for the per-channel moments.

    Returns (G1 (S,), Gy (C, S), Gy2 (C, S), X (N,), Xd, beta0 (S,), ll):
    per-state occupancies, per-channel first/second signal moments
    (linear space, flat [silent | body] layout), onset-edge xi sums with
    the silent-occupancy denominator, window-0 terminal beta (log space,
    for pi), and the telescoped sequence ll. Same constraints as
    overlap_em_stats_pallas (K <= KP+1, N <= 8, W = L + 2H divisible by
    the chunk, >= 2 windows)."""
    T, C = np.shape(yc)
    N, Km1 = np.shape(eb)[1], np.shape(eb)[2]
    W = L + 2 * H
    if Km1 > KP:
        raise ValueError(f"pallas EM kernel supports K <= {KP + 1}")
    if N > 8:
        raise ValueError("pallas EM kernel supports N <= 8")
    if W % CH != 0:
        raise ValueError(f"W = L + 2H = {W} must be a multiple of {CH}")
    if L < 2 * H:
        raise ValueError("need L >= 2H")
    if T < W or T <= L:
        raise ValueError("signal shorter than two windows")
    return _overlap_em_stats_mc_impl(es, eb, yc, lp, L=L, H=H,
                                     interpret=interpret)
