"""Pallas TPU kernels: EXACT onset posteriors for the non-overlap ring
space — the fused-kernel backend of core/posterior.onset_posteriors_chained.

Same multi-block layout as the fused EM kernels (ops/pallas_fb_mb.py:
windows on the VPU lanes, ring slots on KP-padded sublane segments, the
alpha recursion shared verbatim via _make_alpha_step), applied to the
chained-window exact two-pass instead of the halo-window approximation:

  * the forward kernel takes a per-lane ENTRY alpha (the previous
    window's terminal, exact after one chaining sweep up to decay^L) and
    streams chunk-boundary alpha checkpoints; its last checkpoint IS the
    window's terminal alpha — the next window's entry;
  * the gamma kernel rematerializes each chunk's alphas from the
    checkpoints (bit-identical — same closure), walks beta right-to-left
    from a per-lane EXIT beta with a per-lane terminal position (the
    zero-padded tail window places beta[T-1] = 0 exactly at the true
    signal end), and emits the per-step onset-row posteriors
    exp(alpha + beta - z_t) — z_t the per-step all-state logsumexp, so
    window-local score shifts cancel. It also outputs each window's
    first-position beta: the predecessor's exit for the backward
    chaining sweep.

Cost: one forward sweep + one beta sweep (chaining) + one forward + one
gamma pass ~= 2 fused EM E-steps; everything stays VPU-fused with G=128
windows in flight. Exactness: decay^(refine*L) chaining error (below
dtype noise for any L >> the chain's mixing time) + f32 in-window drift
(see core/posterior's error notes); the f64 anchor lives in the XLA
chained driver's tests (core/posterior.onset_posteriors_chained).

Reference anchor: posteriors are gamma = alpha + beta - logZ over the
reference's forward/backward semantics (src/baumwelch.jl:25-98,
emission-only init / beta[T-1] = 0); the onset rows are ring position 1
per neuron — row n*KP of the segment layout.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.logmath import HALF_LOG_2PI
from .pallas_fb_mb import (G, KP, NEG, _chunk, _lae, _lse_rows,
                           _make_alpha_step, _round_up)

NR = 8           # gamma / beta-exit row padding (N <= 8, sublane rule)


def _make_gfwd_kernel(N: int, Km1: int, ch: int, stream_em: bool = False):
    """Forward sweep: per-lane entry alpha (or cold emission init where
    has_init == 0), chunk-boundary checkpoints out. The last chunk's
    checkpoint is the window terminal (the chaining handoff).
    stream_em selects the multi-channel front-end: per-step emissions
    are READ from precomputed stream windows (the pallas_fb_mb MC
    pattern) instead of computed from the raw samples."""
    NKP = N * KP

    def kernel(*args):
        if stream_em:
            (es_ref, eb_ref, consts_ref, lpv_ref, en_s_ref, en_b_ref,
             hi_ref, cps_ref, cpb_ref, as_s, ab_s) = args
        else:
            (y_ref, consts_ref, lpv_ref, bm_ref, en_s_ref, en_b_ref,
             hi_ref, cps_ref, cpb_ref, as_s, ab_s) = args
        c = pl.program_id(1)
        lpz = consts_ref[0, 0]
        self_w = N * lpz
        stay_w = (N - 1) * lpz
        swap_w = (N - 2) * lpz
        lpn = [lpv_ref[n : n + 1, :] for n in range(N)]

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

        for s in range(ch):
            def step(s=s):
                es, eb = em_at(s)
                new_vs, new_vb = fstep(as_s[0:1, :], ab_s[...], es, eb)
                as_s[0:1, :] = new_vs
                ab_s[...] = new_vb

            if s == 0:
                @pl.when(c == 0)
                def _init():
                    es, eb = em_at(0)
                    hi = hi_ref[0, 0:1, :]                     # (1, G) i32
                    # cold: emission-only init (reference t=0 quirk);
                    # chained: one transition step from the entry alpha
                    st_s, st_b = fstep(en_s_ref[0, 0:1, :],
                                       en_b_ref[0, :, :], es, eb)
                    cold_b = jnp.where(maskk, eb, NEG)
                    as_s[0:1, :] = jnp.where(hi > 0, st_s, es)
                    ab_s[...] = jnp.where(hi > 0, st_b, cold_b)

                @pl.when(c > 0)
                def _():
                    step()
            else:
                step()

        cps_ref[0, :, :] = jnp.broadcast_to(as_s[0:1, :], (8, G))
        cpb_ref[0, :, :] = ab_s[...]

    return kernel


def _make_gamma_kernel(N: int, Km1: int, Wc: int, ch: int,
                       emit_gamma: bool, stream_em: bool = False):
    """Beta walk + gamma emission: remat alpha from the checkpoints
    (entry-aware at chunk 0), beta right-to-left from the per-lane exit
    at the per-lane terminal position, onset-row posteriors out.
    emit_gamma=False builds the chaining sweep variant (beta-first
    output only — no gamma stores); stream_em as in _make_gfwd_kernel
    (the boundary emission arrives precomputed in both modes)."""
    NKP = N * KP

    def kernel(*args):
        if stream_em:
            (es_ref, eb_ref, cps_ref, cpb_ref, consts_ref, lpv_ref,
             en_s_ref, en_b_ref, hi_ref, ex_s_ref, ex_b_ref, term_ref,
             exm_s_ref, exm_b_ref, lastw_ref, *rest) = args
        else:
            (y_ref, cps_ref, cpb_ref, consts_ref, lpv_ref, bm_ref,
             en_s_ref, en_b_ref, hi_ref, ex_s_ref, ex_b_ref, term_ref,
             exm_s_ref, exm_b_ref, lastw_ref, *rest) = args
        if emit_gamma:
            (gam_ref, b0s_ref, b0b_ref,
             bs_s, bb_s, ems_s, emb_s, ral_s, ral_b) = rest
        else:
            (b0s_ref, b0b_ref,
             bs_s, bb_s, ems_s, emb_s, ral_s, ral_b) = rest
        c = pl.program_id(1)
        cc = Wc - 1 - c
        lpz = consts_ref[0, 0]
        self_w = N * lpz
        stay_w = (N - 1) * lpz
        swap_w = (N - 2) * lpz
        lpn = [lpv_ref[n : n + 1, :] for n in range(N)]

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

        term = term_ref[0, 0:1, :]                             # (1, G) i32
        ex_s = ex_s_ref[0, 0:1, :]
        ex_b = ex_b_ref[0, :, :]
        lastw = lastw_ref[0, 0:1, :]                           # (1, G) i32
        # boundary emission: the sample one past the window end (the exit
        # beta lives at that position; one recursion step places it at
        # the window's last sample) — precomputed per lane by the driver
        es_x = exm_s_ref[0, 0:1, :]                            # (1, G)
        eb_x = exm_b_ref[0, :, :]                              # (NKP, G)

        # --- remat this chunk's alphas (entry-aware at actual chunk 0)
        for s in range(ch):
            if s == 0:
                @pl.when(c == Wc - 1)
                def _remat_init():
                    es0, eb0 = em_at(0)
                    hi = hi_ref[0, 0:1, :]
                    st_s, st_b = fstep(en_s_ref[0, 0:1, :],
                                       en_b_ref[0, :, :], es0, eb0)
                    cold_b = jnp.where(maskk, eb0, NEG)
                    ral_s[0:1, :] = jnp.where(hi > 0, st_s, es0)
                    ral_b[0:NKP, :] = jnp.where(hi > 0, st_b, cold_b)

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

        zero1 = jnp.zeros((1, G), jnp.float32)

        def stepped(bs, bb, emsp, embp):
            bon = [bb[n * KP : n * KP + 1, :] for n in range(N)]
            eon = [embp[n * KP : n * KP + 1, :] for n in range(N)]
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
            return new_bs, jnp.where(maskk, new_bb, NEG)

        # terminal beta, loop-invariant: the true last window places
        # beta[T-1] = 0 exactly; others take one recursion step from the
        # exit beta (at the sample past the window end) through the
        # boundary emission
        tm_s, tm_b = stepped(ex_s, ex_b, es_x, eb_x)
        tm_s = jnp.where(lastw > 0, zero1, tm_s)
        tm_b = jnp.where(lastw > 0, jnp.where(maskk, 0.0, NEG), tm_b)

        for s in range(ch - 1, -1, -1):
            def tail(s, new_bs, new_bb, a_s, a_b, es, eb):
                if emit_gamma:
                    tot = a_b + new_bb
                    sil = a_s + new_bs
                    m = jnp.maximum(jnp.max(tot, axis=0, keepdims=True),
                                    sil)
                    z_t = m + jnp.log(
                        jnp.sum(jnp.exp(tot - m), axis=0, keepdims=True)
                        + jnp.exp(sil - m))
                    rows = [jnp.exp(tot[n * KP : n * KP + 1, :] - z_t)
                            for n in range(N)]
                    rows += [zero1] * (NR - N)
                    gam_ref[0, s * NR : (s + 1) * NR, :] = (
                        jnp.concatenate(rows, axis=0))
                bs_s[0:1, :] = new_bs
                bb_s[...] = new_bb
                ems_s[0:1, :] = es
                emb_s[...] = eb

            def step(s=s, first_step=False):
                t = cc * ch + s
                es, eb = em_at(s)
                a_s = ral_s[s : s + 1, :]
                a_b = ral_b[s * NKP : (s + 1) * NKP, :]
                if first_step:
                    # very first processed step: caches are uninitialized
                    # — any t > term lane (padded tail) takes a benign 0
                    st_s, st_b = zero1, jnp.where(maskk,
                                                  jnp.zeros((NKP, G),
                                                            jnp.float32),
                                                  NEG)
                else:
                    st_s, st_b = stepped(bs_s[0:1, :], bb_s[...],
                                         ems_s[0:1, :], emb_s[...])
                is_term = t == term
                new_bs = jnp.where(is_term, tm_s, st_s)
                new_bb = jnp.where(is_term, tm_b, st_b)
                tail(s, new_bs, new_bb, a_s, a_b, es, eb)

            if s == ch - 1:
                @pl.when(c == 0)
                def _():
                    step(first_step=True)

                @pl.when(c > 0)
                def _():
                    step()
            else:
                step()

        @pl.when(c == Wc - 1)
        def _final():
            b0s_ref[0] = bs_s[0:1, :]
            b0b_ref[0] = bb_s[...]

    return kernel


def _pack_lanes(x, B, Bg, fill=0.0):
    """(B, R) -> (Bg, R, G) lane layout (pad windows get `fill`)."""
    Bp = Bg * G
    R = x.shape[1]
    xp = jnp.full((Bp, R), fill, x.dtype).at[:B].set(x)
    return xp.reshape(Bg, G, R).transpose(0, 2, 1)


def _unpack_lanes(x, B):
    """(Bg, R, G) -> (B, R)."""
    Bg, R, _ = x.shape
    return x.transpose(0, 2, 1).reshape(Bg * G, R)[:B]


def _shared_tables(lp, mu, sigma, N, Km1, dtype):
    lpz = jnp.log1p(-jnp.exp(jnp.sum(lp)))
    silent_mean = jnp.sum(mu[0])
    consts = jnp.stack([lpz, jnp.log(sigma),
                        1.0 / (2.0 * sigma * sigma), silent_mean,
                        0.0, 0.0, 0.0, 0.0])[None, :]
    lpv = jnp.zeros((8, 1), dtype).at[:N, 0].set(lp)
    lpv = jnp.broadcast_to(lpv, (8, G))
    body = mu[1:].T + (silent_mean - mu[0])[:, None]
    bmg = jnp.zeros((N, KP), dtype).at[:, :Km1].set(body)
    bm = jnp.broadcast_to(bmg.reshape(N * KP, 1), (N * KP, G))
    return consts, lpv, bm


@partial(jax.jit, static_argnames=("L", "refine", "interpret"))
def _gamma_chained_impl(y_pad, lp, mu, sigma, n_valid, *, L, refine,
                        interpret=False):
    """Device program: padded (B*L,) signal -> (B, L, NR) onset-row
    posteriors via the chained Pallas sweeps. n_valid = T (traced)."""
    K, N = mu.shape
    Km1 = K - 1
    NKP = N * KP
    dtype = jnp.float32

    lp = jnp.asarray(lp, dtype)
    mu = jnp.asarray(mu, dtype)
    sigma = jnp.asarray(sigma, dtype)
    consts, lpv, bm = _shared_tables(lp, mu, sigma, N, Km1, dtype)

    BL = y_pad.shape[0]
    B = BL // L
    Bg = _round_up(B, G) // G
    Bp = Bg * G
    ch = _chunk(N)
    Wc = L // ch

    ypp = jnp.zeros((Bp, L), dtype).at[:B].set(
        y_pad.astype(dtype).reshape(B, L))
    y_in = ypp.reshape(Bg, G, L).transpose(0, 2, 1)            # (Bg, L, G)

    # per-lane terminal position (window-local index of the last real
    # sample; windows fully beyond T never match — term = -1)
    w_end = jnp.minimum((jnp.arange(B) + 1) * L, n_valid) - 1
    term = jnp.where(w_end >= jnp.arange(B) * L,
                     w_end - jnp.arange(B) * L, -1).astype(jnp.int32)
    term_in = _pack_lanes(term[:, None], B, Bg).astype(jnp.int32)
    term_in = term_in.reshape(Bg, 1, G)
    # boundary emissions: the sample one past each window end (zero past
    # the padded signal), through the same Gaussian tables the kernel
    # uses in-step
    ybnd = jnp.concatenate([y_pad.astype(dtype),
                            jnp.zeros((1,), dtype)])[
        (jnp.arange(B) + 1) * L]
    econst_x = -HALF_LOG_2PI - jnp.log(sigma)
    inv_x = 1.0 / (2.0 * sigma * sigma)
    smean = jnp.sum(mu[0])
    exm_s = (econst_x - (ybnd - smean) ** 2 * inv_x)[:, None]  # (B, 1)
    bmrow = bm[:, 0]                                           # (NKP,)
    exm_b = econst_x - (ybnd[:, None] - bmrow[None, :]) ** 2 * inv_x
    exm_s_in = _pack_lanes(exm_s, B, Bg).reshape(Bg, 1, G)
    exm_b_in = _pack_lanes(exm_b, B, Bg)                   # (Bg, NKP, G)
    lastw = (jnp.arange(B) == B - 1).astype(jnp.int32)
    lastw_in = _pack_lanes(lastw[:, None], B, Bg).astype(
        jnp.int32).reshape(Bg, 1, G)

    zs = jnp.zeros((B, 1), dtype)
    zb = jnp.zeros((B, NKP), dtype)

    def fwd(en_s, en_b, has_init):
        kernel = _make_gfwd_kernel(N, Km1, ch)
        in_specs = [
            pl.BlockSpec((1, ch, G), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda b, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, G), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NKP, G), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NKP, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = [
            pl.BlockSpec((1, 8, G), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NKP, G), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((Bg, Wc * 8, G), jnp.float32),
            jax.ShapeDtypeStruct((Bg, Wc * NKP, G), jnp.float32),
        ]
        scratch = [pltpu.VMEM((8, G), jnp.float32),
                   pltpu.VMEM((NKP, G), jnp.float32)]
        en_s_in = _pack_lanes(en_s, B, Bg).reshape(Bg, 1, G)
        en_b_in = _pack_lanes(en_b, B, Bg)
        hi_in = _pack_lanes(has_init[:, None].astype(jnp.int32), B,
                            Bg).reshape(Bg, 1, G)
        return pl.pallas_call(
            kernel, out_shape=out_shape, grid=(Bg, Wc),
            in_specs=in_specs, out_specs=out_specs,
            scratch_shapes=scratch, interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(y_in, consts, lpv, bm, en_s_in, en_b_in, hi_in)

    def bwd(cps, cpb, en_s, en_b, has_init, ex_s, ex_b, emit_gamma):
        kernel = _make_gamma_kernel(N, Km1, Wc, ch, emit_gamma)
        rev = lambda b, c: (b, Wc - 1 - c, 0)
        rev_prev = lambda b, c: (b, jnp.maximum(Wc - 2 - c, 0), 0)
        in_specs = [
            pl.BlockSpec((1, ch, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, G), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NKP, G), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda b, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, G), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NKP, G), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NKP, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NKP, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NKP, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = [
            pl.BlockSpec((1, 1, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NKP, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((Bg, 1, G), jnp.float32),
            jax.ShapeDtypeStruct((Bg, NKP, G), jnp.float32),
        ]
        if emit_gamma:
            out_specs = [pl.BlockSpec((1, ch * NR, G), rev,
                                      memory_space=pltpu.VMEM)] + out_specs
            out_shape = [jax.ShapeDtypeStruct((Bg, L * NR, G),
                                              jnp.float32)] + out_shape
        scratch = [
            pltpu.VMEM((8, G), jnp.float32),       # beta silent
            pltpu.VMEM((NKP, G), jnp.float32),     # beta body
            pltpu.VMEM((8, G), jnp.float32),       # em silent cache
            pltpu.VMEM((NKP, G), jnp.float32),     # em body cache
            pltpu.VMEM((ch, G), jnp.float32),      # remat alpha silent
            pltpu.VMEM((ch * NKP, G), jnp.float32),  # remat alpha body
        ]
        en_s_in = _pack_lanes(en_s, B, Bg).reshape(Bg, 1, G)
        en_b_in = _pack_lanes(en_b, B, Bg)
        hi_in = _pack_lanes(has_init[:, None].astype(jnp.int32), B,
                            Bg).reshape(Bg, 1, G)
        ex_s_in = _pack_lanes(ex_s, B, Bg).reshape(Bg, 1, G)
        ex_b_in = _pack_lanes(ex_b, B, Bg)
        return pl.pallas_call(
            kernel, out_shape=out_shape, grid=(Bg, Wc),
            in_specs=in_specs, out_specs=out_specs,
            scratch_shapes=scratch, interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(y_in, cps, cpb, consts, lpv, bm, en_s_in, en_b_in, hi_in,
          ex_s_in, ex_b_in, term_in, exm_s_in, exm_b_in, lastw_in)

    def terminals(cps, cpb):
        """Per-window terminal alpha from the last chunk's checkpoint."""
        ts = _unpack_lanes(cps[:, (Wc - 1) * 8 : (Wc - 1) * 8 + 1, :], B)
        tb = _unpack_lanes(cpb[:, (Wc - 1) * NKP : Wc * NKP, :], B)
        return ts, tb

    def recenter(vs, vb):
        m = jnp.maximum(jnp.max(vb, axis=1, keepdims=True), vs)
        return vs - m, vb - m

    def shift_down(vs, vb):
        """entries[b] := value[b-1]; entry 0 unused (cold)."""
        return (jnp.concatenate([zs[:1], vs[:-1]]),
                jnp.concatenate([zb[:1], vb[:-1]]))

    def shift_up(vs, vb):
        """exits[b] := value[b+1]; last exit 0 (exact terminal)."""
        return (jnp.concatenate([vs[1:], zs[:1]]),
                jnp.concatenate([vb[1:], zb[:1]]))

    no_init = jnp.zeros((B,), jnp.int32)
    chained = jnp.arange(B) > 0

    # forward chaining sweeps
    cps, cpb = fwd(zs, zb, no_init)
    en_s, en_b = shift_down(*recenter(*terminals(cps, cpb)))
    for _ in range(max(0, refine - 1)):
        cps, cpb = fwd(en_s, en_b, chained)
        en_s, en_b = shift_down(*recenter(*terminals(cps, cpb)))
    cps, cpb = fwd(en_s, en_b, chained)          # final forward pass

    # backward chaining sweeps (beta-first outputs only)
    b0s, b0b = bwd(cps, cpb, en_s, en_b, chained, zs, zb,
                   emit_gamma=False)
    ex_s, ex_b = shift_up(*recenter(_unpack_lanes(b0s, B),
                                    _unpack_lanes(b0b, B)))
    for _ in range(max(0, refine - 1)):
        b0s, b0b = bwd(cps, cpb, en_s, en_b, chained, ex_s, ex_b,
                       emit_gamma=False)
        ex_s, ex_b = shift_up(*recenter(_unpack_lanes(b0s, B),
                                        _unpack_lanes(b0b, B)))

    # final gamma pass
    gam, _, _ = bwd(cps, cpb, en_s, en_b, chained, ex_s, ex_b,
                    emit_gamma=True)
    # (Bg, L*NR, G) -> (B*L, N) — slice the row padding off ON DEVICE:
    # the fetch is the long pole on tunneled backends (NR/N x smaller)
    gam = gam.reshape(Bg, L, NR, G).transpose(0, 3, 1, 2).reshape(
        Bp * L, NR)[: B * L, :N]
    return gam


@partial(jax.jit, static_argnames=("L", "refine", "interpret"))
def _gamma_chained_impl_mc(es_pad, eb_pad, lp, n_valid, *, L, refine,
                           interpret=False):
    """MC device program over precomputed log-emission streams:
    es_pad (B*L+1,), eb_pad (B*L+1, N, Km1) — the trailing row is the
    boundary sample past the padded signal. Same sweeps as the SC impl
    with stream_em kernels (the pallas_fb_mb MC pattern)."""
    BL = es_pad.shape[0] - 1
    _, N, Km1 = eb_pad.shape
    NKP = N * KP
    dtype = jnp.float32

    lp = jnp.asarray(lp, dtype)
    lpz = jnp.log1p(-jnp.exp(jnp.sum(lp)))
    consts = jnp.stack([lpz] + [jnp.zeros(())] * 7)[None, :].astype(dtype)
    lpv = jnp.zeros((8, 1), dtype).at[:N, 0].set(lp)
    lpv = jnp.broadcast_to(lpv, (8, G))

    B = BL // L
    Bg = _round_up(B, G) // G
    Bp = Bg * G
    ch = _chunk(N)
    Wc = L // ch

    es = es_pad[:BL].astype(dtype)
    eb_kp = jnp.zeros((BL, N, KP), dtype).at[:, :, :Km1].set(
        eb_pad[:BL].astype(dtype)).reshape(BL, NKP)
    es_in = (jnp.zeros((Bp, L), dtype).at[:B].set(es.reshape(B, L))
             .reshape(Bg, G, L).transpose(0, 2, 1))            # (Bg, L, G)
    eb_in = (jnp.zeros((Bp, L, NKP), dtype)
             .at[:B].set(eb_kp.reshape(B, L, NKP))
             .reshape(Bg, G, L, NKP).transpose(0, 2, 3, 1)
             .reshape(Bg, L * NKP, G))

    w_end = jnp.minimum((jnp.arange(B) + 1) * L, n_valid) - 1
    term = jnp.where(w_end >= jnp.arange(B) * L,
                     w_end - jnp.arange(B) * L, -1).astype(jnp.int32)
    term_in = _pack_lanes(term[:, None], B, Bg).astype(jnp.int32)
    term_in = term_in.reshape(Bg, 1, G)
    # boundary emissions straight from the streams
    bidx = (jnp.arange(B) + 1) * L
    exm_s = es_pad.astype(dtype)[bidx][:, None]                # (B, 1)
    exm_b = jnp.zeros((B, N, KP), dtype).at[:, :, :Km1].set(
        eb_pad.astype(dtype)[bidx]).reshape(B, NKP)
    exm_s_in = _pack_lanes(exm_s, B, Bg).reshape(Bg, 1, G)
    exm_b_in = _pack_lanes(exm_b, B, Bg)
    lastw = (jnp.arange(B) == B - 1).astype(jnp.int32)
    lastw_in = _pack_lanes(lastw[:, None], B, Bg).astype(
        jnp.int32).reshape(Bg, 1, G)

    zs = jnp.zeros((B, 1), dtype)
    zb = jnp.zeros((B, NKP), dtype)

    def fwd(en_s, en_b, has_init):
        kernel = _make_gfwd_kernel(N, Km1, ch, stream_em=True)
        in_specs = [
            pl.BlockSpec((1, ch, G), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch * NKP, G), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda b, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, G), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NKP, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = [
            pl.BlockSpec((1, 8, G), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NKP, G), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((Bg, Wc * 8, G), jnp.float32),
            jax.ShapeDtypeStruct((Bg, Wc * NKP, G), jnp.float32),
        ]
        scratch = [pltpu.VMEM((8, G), jnp.float32),
                   pltpu.VMEM((NKP, G), jnp.float32)]
        en_s_in = _pack_lanes(en_s, B, Bg).reshape(Bg, 1, G)
        en_b_in = _pack_lanes(en_b, B, Bg)
        hi_in = _pack_lanes(has_init[:, None].astype(jnp.int32), B,
                            Bg).reshape(Bg, 1, G)
        return pl.pallas_call(
            kernel, out_shape=out_shape, grid=(Bg, Wc),
            in_specs=in_specs, out_specs=out_specs,
            scratch_shapes=scratch, interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(es_in, eb_in, consts, lpv, en_s_in, en_b_in, hi_in)

    def bwd(cps, cpb, en_s, en_b, has_init, ex_s, ex_b, emit_gamma):
        kernel = _make_gamma_kernel(N, Km1, Wc, ch, emit_gamma,
                                    stream_em=True)
        rev = lambda b, c: (b, Wc - 1 - c, 0)
        rev_prev = lambda b, c: (b, jnp.maximum(Wc - 2 - c, 0), 0)
        in_specs = [
            pl.BlockSpec((1, ch, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ch * NKP, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, G), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NKP, G), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda b, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, G), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NKP, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NKP, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NKP, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_specs = [
            pl.BlockSpec((1, 1, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NKP, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((Bg, 1, G), jnp.float32),
            jax.ShapeDtypeStruct((Bg, NKP, G), jnp.float32),
        ]
        if emit_gamma:
            out_specs = [pl.BlockSpec((1, ch * NR, G), rev,
                                      memory_space=pltpu.VMEM)] + out_specs
            out_shape = [jax.ShapeDtypeStruct((Bg, L * NR, G),
                                              jnp.float32)] + out_shape
        scratch = [
            pltpu.VMEM((8, G), jnp.float32),
            pltpu.VMEM((NKP, G), jnp.float32),
            pltpu.VMEM((8, G), jnp.float32),
            pltpu.VMEM((NKP, G), jnp.float32),
            pltpu.VMEM((ch, G), jnp.float32),
            pltpu.VMEM((ch * NKP, G), jnp.float32),
        ]
        en_s_in = _pack_lanes(en_s, B, Bg).reshape(Bg, 1, G)
        en_b_in = _pack_lanes(en_b, B, Bg)
        hi_in = _pack_lanes(has_init[:, None].astype(jnp.int32), B,
                            Bg).reshape(Bg, 1, G)
        ex_s_in = _pack_lanes(ex_s, B, Bg).reshape(Bg, 1, G)
        ex_b_in = _pack_lanes(ex_b, B, Bg)
        return pl.pallas_call(
            kernel, out_shape=out_shape, grid=(Bg, Wc),
            in_specs=in_specs, out_specs=out_specs,
            scratch_shapes=scratch, interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(es_in, eb_in, cps, cpb, consts, lpv, en_s_in, en_b_in, hi_in,
          ex_s_in, ex_b_in, term_in, exm_s_in, exm_b_in, lastw_in)

    def terminals(cps, cpb):
        ts = _unpack_lanes(cps[:, (Wc - 1) * 8 : (Wc - 1) * 8 + 1, :], B)
        tb = _unpack_lanes(cpb[:, (Wc - 1) * NKP : Wc * NKP, :], B)
        return ts, tb

    def recenter(vs, vb):
        m = jnp.maximum(jnp.max(vb, axis=1, keepdims=True), vs)
        return vs - m, vb - m

    def shift_down(vs, vb):
        return (jnp.concatenate([zs[:1], vs[:-1]]),
                jnp.concatenate([zb[:1], vb[:-1]]))

    def shift_up(vs, vb):
        return (jnp.concatenate([vs[1:], zs[:1]]),
                jnp.concatenate([vb[1:], zb[:1]]))

    no_init = jnp.zeros((B,), jnp.int32)
    chained = jnp.arange(B) > 0

    cps, cpb = fwd(zs, zb, no_init)
    en_s, en_b = shift_down(*recenter(*terminals(cps, cpb)))
    for _ in range(max(0, refine - 1)):
        cps, cpb = fwd(en_s, en_b, chained)
        en_s, en_b = shift_down(*recenter(*terminals(cps, cpb)))
    cps, cpb = fwd(en_s, en_b, chained)

    b0s, b0b = bwd(cps, cpb, en_s, en_b, chained, zs, zb,
                   emit_gamma=False)
    ex_s, ex_b = shift_up(*recenter(_unpack_lanes(b0s, B),
                                    _unpack_lanes(b0b, B)))
    for _ in range(max(0, refine - 1)):
        b0s, b0b = bwd(cps, cpb, en_s, en_b, chained, ex_s, ex_b,
                       emit_gamma=False)
        ex_s, ex_b = shift_up(*recenter(_unpack_lanes(b0s, B),
                                        _unpack_lanes(b0b, B)))

    gam, _, _ = bwd(cps, cpb, en_s, en_b, chained, ex_s, ex_b,
                    emit_gamma=True)
    gam = gam.reshape(Bg, L, NR, G).transpose(0, 3, 1, 2).reshape(
        Bp * L, NR)[: B * L, :N]
    return gam


def gamma_hbm_bytes(T: int, N: int, L: int = 4096) -> int:
    """HBM estimate: alpha checkpoints ((T/chunk) * (N*KP+8) rows) +
    the NR-row gamma output + inputs (MC streams add eb (T, N*KP))."""
    ch = _chunk(N)
    B = -(-T // L)
    return (B * (L // ch) * (N * KP + 8) * 4
            + B * L * NR * 4
            + B * L * (N * KP + 2) * 4)


def gamma_hbm_ok(T: int, N: int, L: int = 4096,
                 budget: int = 10 * 2**30) -> bool:
    return gamma_hbm_bytes(T, N, L) <= budget


def onset_gammas_pallas_mc(yc, lp, mu, sigmas, *, L: int = 4096,
                           refine: int = 1,
                           interpret: bool = False) -> np.ndarray:
    """(T, N) EXACT onset posteriors for a joint multi-channel model on
    the non-overlap topology via the fused chained-window kernels with
    stream emissions (train/em_mc._mc_streams_dense — the same channel
    collapse the MC EM kernels consume). Constraints as
    onset_gammas_pallas."""
    from ..train.em_mc import _mc_streams_dense

    yc = np.asarray(yc)
    if yc.ndim != 2:
        raise ValueError("onset_gammas_pallas_mc takes (T, C)")
    T, C = yc.shape
    K, N = np.shape(mu)[:2]
    if K - 1 > KP:
        raise ValueError(f"pallas gamma kernel supports K <= {KP + 1}")
    if N > NR:
        raise ValueError(f"pallas gamma kernel supports N <= {NR}")
    ch = _chunk(N)
    if L % ch != 0:
        raise ValueError(f"L={L} must be a multiple of {ch}")
    B = -(-T // L)
    if B < 2:
        raise ValueError("signal shorter than two windows")
    yc_pad = np.zeros((B * L + 1, C), dtype=yc.dtype)
    yc_pad[:T] = yc
    es, body = _mc_streams_dense(jnp.asarray(yc_pad, jnp.float32),
                                 jnp.asarray(mu, jnp.float32),
                                 jnp.asarray(sigmas, jnp.float32))
    eb = body.reshape(B * L + 1, N, K - 1)
    gam = _gamma_chained_impl_mc(es, eb, jnp.asarray(lp),
                                 jnp.asarray(T, jnp.int32), L=L,
                                 refine=refine, interpret=interpret)
    return np.asarray(gam)[:T].astype(np.float64)


def onset_gammas_pallas(y, lp, mu, sigma, *, L: int = 4096,
                        refine: int = 1,
                        interpret: bool = False) -> np.ndarray:
    """(T, N) EXACT onset posteriors on the non-overlap topology via the
    fused chained-window kernels. Requires K <= KP+1, N <= 8, L a
    multiple of the chunk size, and B >= 2 windows; callers route other
    cases to core/posterior.onset_posteriors_chained (XLA) or the exact
    two-pass."""
    y = np.asarray(y)
    T = y.shape[0]
    K, N = np.shape(mu)
    if K - 1 > KP:
        raise ValueError(f"pallas gamma kernel supports K <= {KP + 1}")
    if N > NR:
        raise ValueError(f"pallas gamma kernel supports N <= {NR}")
    ch = _chunk(N)
    if L % ch != 0:
        raise ValueError(f"L={L} must be a multiple of {ch}")
    B = -(-T // L)
    if B < 2:
        raise ValueError("signal shorter than two windows")
    y_pad = np.zeros(B * L, dtype=y.dtype)
    y_pad[:T] = y
    gam = _gamma_chained_impl(jnp.asarray(y_pad), jnp.asarray(lp),
                              jnp.asarray(mu), jnp.asarray(sigma),
                              jnp.asarray(T, jnp.int32), L=L,
                              refine=refine, interpret=interpret)
    return np.asarray(gam)[:T].astype(np.float64)
