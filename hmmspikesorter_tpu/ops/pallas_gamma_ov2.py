"""Pallas TPU kernels: EXACT onset posteriors for the N=2 pairwise-overlap
ring space — the production decode/confidence topology (S = 3600 at
K=60) — as the fused backend of core/posterior.onset_posteriors_chained.

Log-plus sibling of the multi-block Viterbi kernel
(ops/pallas_viterbi_mb.py): same VMEM state layout (vs (1,G) silent,
v0/v1 (KP,G) single rings on sublanes, vp (KP,KP,G) pair grid; G = 128
windows on the lanes), same structural reads (sublane rolls, the
flattened KP+1 diagonal roll), with logsumexp in place of first-max and
no backpointers. Applied to the chained-window exact two-pass of
ops/pallas_gamma_mb.py:

  * forward kernel: per-lane ENTRY state (or the reference cold
    emission init), chunk-boundary state checkpoints streamed to HBM
    (the last checkpoint is the chaining terminal);
  * gamma kernel: rematerializes each chunk's alphas from the
    checkpoints (same fstep closure — bit-identical), walks beta
    right-to-left (the exact edge transposition of the forward
    structure, mirroring core/posterior._ov2_fb_scan's bstep) from a
    per-lane EXIT state applied through the boundary emission at the
    per-lane terminal position, and emits the two onset-row posteriors
    exp(alpha + beta - z_t): onset of neuron 0 is the single-0 slot-0
    row PLUS the pair grid's k1 = 0 row (both members' phases live in
    the pair states), neuron 1 symmetrically.

The pair grid makes the remat slab the VMEM budget: ch = 8 steps per
chunk keeps the (ch * (1 + 2 KP + KP^2), G) alpha slab ~17 MB — inside
the raised 64 MB scoped ceiling validated by the decode kernels
(ops/pallas_viterbi_ovn_mb.VMEM_LIMIT); chunk-boundary checkpoints cost
(T/ch) * ~17 KB of HBM (~4.4 GB at T = 2^21).

Reference anchor: forward/backward semantics of src/baumwelch.jl:25-98
on the hmmsort overlap topology (src/types.jl:65-127); the onset rows
are ring phase 1 per neuron.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.logmath import HALF_LOG_2PI
from .pallas_fb_mb import G, KP, NEG, _lae, _round_up
from .pallas_viterbi_ovn_mb import VMEM_LIMIT

CH2 = 8          # steps per chunk (the pair-grid remat slab bound)
NR = 8           # gamma row padding (sublane rule)


def _lse4(a, b, c, d):
    m = jnp.maximum(jnp.maximum(a, b), jnp.maximum(c, d))
    return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m)
                       + jnp.exp(c - m) + jnp.exp(d - m))


def _make_tables(Km1):
    sub2 = jax.lax.broadcasted_iota(jnp.int32, (KP, G), 0)
    seg3 = jax.lax.broadcasted_iota(jnp.int32, (KP, KP, G), 0)
    sub3 = jax.lax.broadcasted_iota(jnp.int32, (KP, KP, G), 1)
    mask1 = sub2 < Km1
    maskp = (seg3 < Km1) & (sub3 < Km1)
    return sub2, seg3, sub3, mask1, maskp


def _make_fstep(Km1, lp0, lp1, lpz, tabs):
    """One forward log-alpha update (vs, v0, v1, vp) -> new state; the
    exact log-plus mirror of ops/pallas_viterbi_mb's max-plus step
    (sublane rolls + flattened diagonal roll), shared by the forward
    kernel and the gamma kernel's remat so they are bit-identical."""
    sub2, seg3, sub3, mask1, maskp = tabs

    def fstep(vs, v0, v1, vp, es, e0, e1, ep):
        end0 = v0[Km1 - 1 : Km1, :]                            # (1, G)
        end1 = v1[Km1 - 1 : Km1, :]
        lastcol = vp[:, Km1 - 1, :]                            # (KP, G) k1
        lastrow = vp[Km1 - 1]                                  # (KP, G) k2
        p_end = lastrow[Km1 - 1 : Km1, :]

        new_vs = _lse4(vs + 2.0 * lpz, end0 + lpz, end1 + lpz,
                       p_end) + es
        on0 = _lae(vs + lp0 + lpz, end1 + lp0)
        on1 = _lae(vs + lp1 + lpz, end0 + lp1)
        r0 = _lae(pltpu.roll(v0, 1, axis=0) + lpz,
                  pltpu.roll(lastcol, 1, axis=0))
        r1 = _lae(pltpu.roll(v1, 1, axis=0) + lpz,
                  pltpu.roll(lastrow, 1, axis=0))
        new_v0 = jnp.where(sub2 == 0, on0, r0)
        new_v1 = jnp.where(sub2 == 0, on1, r1)
        new_v0 = jnp.where(mask1, new_v0 + e0, NEG)
        new_v1 = jnp.where(mask1, new_v1 + e1, NEG)

        flat = vp.reshape(KP * KP, G)
        rolled = pltpu.roll(flat, KP + 1, axis=0).reshape(KP, KP, G)
        top = pltpu.roll(v1, 1, axis=0) + lp0                  # (KP, G) k2
        top = jnp.where(sub2 == 0, vs + lp0 + lp1, top)
        left = pltpu.roll(v0, 1, axis=0) + lp1                 # (KP, G) k1
        new_vp = jnp.where(seg3 == 0, top[None, :, :],
                           jnp.where(sub3 == 0, left[:, None, :],
                                     rolled))
        new_vp = jnp.where(maskp, new_vp + ep, NEG)
        return new_vs, new_v0, new_v1, new_vp

    return fstep


def _make_bstep(Km1, lp0, lp1, lpz, tabs):
    """One backward log-beta update — the exact edge transposition of
    _make_fstep (mirrors core/posterior._ov2_fb_scan's bstep). Consumes
    the NEXT step's emissions."""
    sub2, seg3, sub3, mask1, maskp = tabs

    def bstep(bs, b0, b1, bp, esp, e0p, e1p, epp):
        BS = bs + esp
        B0 = jnp.where(mask1, b0 + e0p, NEG)
        B1 = jnp.where(mask1, b1 + e1p, NEG)
        BP = jnp.where(maskp, bp + epp, NEG)
        b0on = B0[0:1, :]                                      # (1, G)
        b1on = B1[0:1, :]
        pcorner = BP[0, 0:1, :]

        new_bs = _lse4(BS + 2.0 * lpz, b0on + lp0 + lpz,
                       b1on + lp1 + lpz, pcorner + lp0 + lp1)

        # singles: body k < K-2 -> same ring k+1 | pair entry; ring end
        # -> silent | partner onset
        up0 = pltpu.roll(B0, KP - 1, axis=0)                   # B0[k+1]
        up1 = pltpu.roll(B1, KP - 1, axis=0)
        colp = pltpu.roll(BP[:, 0, :], KP - 1, axis=0)         # BP[k+1, 0]
        rowp = pltpu.roll(BP[0], KP - 1, axis=0)               # BP[0, k+1]
        body0 = _lae(up0 + lpz, colp + lp1)
        body1 = _lae(up1 + lpz, rowp + lp0)
        end0 = _lae(BS + lpz, b1on + lp1)
        end1 = _lae(BS + lpz, b0on + lp0)
        new_b0 = jnp.where(sub2 == Km1 - 1, end0, body0)
        new_b1 = jnp.where(sub2 == Km1 - 1, end1, body1)
        new_b0 = jnp.where(mask1, new_b0, NEG)
        new_b1 = jnp.where(mask1, new_b1, NEG)

        # pair: interior -> diagonal (k1+1, k2+1); last col -> single0
        # k1+1; last row -> single1 k2+1; corner -> silent
        flat = BP.reshape(KP * KP, G)
        rolled = pltpu.roll(flat, KP * KP - KP - 1,
                            axis=0).reshape(KP, KP, G)
        rowv = jnp.where(sub2 == Km1 - 1, BS, up1)             # (KP, G) k2
        colv = up0                                             # (KP, G) k1
        new_bp = jnp.where(
            seg3 == Km1 - 1, rowv[None, :, :],
            jnp.where(sub3 == Km1 - 1, colv[:, None, :], rolled))
        new_bp = jnp.where(maskp, new_bp, NEG)
        return new_bs, new_b0, new_b1, new_bp

    return bstep


def _read_params(consts_ref, per_lane):
    """(lpz, log_sigma, inv_2s2, silent_mean, lp0, lp1) as scalars
    (shared) or (1, G) per-lane rows (drift-tracked: each lane = one
    window with its own parameters); the score math broadcasts either
    way."""
    if per_lane:
        return tuple(consts_ref[0, i : i + 1, :] for i in range(6))
    return tuple(consts_ref[0, i] for i in range(6))


def _make_ov2_fwd_kernel(Km1: int, ch: int, per_lane: bool = False):
    def kernel(y_ref, consts_ref, b0m_ref, b1m_ref, pm_ref,
               en_s_ref, en_0_ref, en_1_ref, en_p_ref, hi_ref,
               cps_ref, cp0_ref, cp1_ref, cpp_ref,
               vs_s, v0s, v1s, vps):
        c = pl.program_id(1)
        (lpz, log_sigma, inv_2s2, silent_mean, lp0,
         lp1) = _read_params(consts_ref, per_lane)
        econst = -HALF_LOG_2PI - log_sigma
        tabs = _make_tables(Km1)
        _, _, _, mask1, maskp = tabs
        fstep = _make_fstep(Km1, lp0, lp1, lpz, tabs)
        b0m = b0m_ref[0]
        b1m = b1m_ref[0]
        pm = pm_ref[0]

        def em_at(s):
            y_t = y_ref[0, s : s + 1, :]
            es = econst - (y_t - silent_mean) ** 2 * inv_2s2
            e0 = econst - (y_t - b0m) ** 2 * inv_2s2
            e1 = econst - (y_t - b1m) ** 2 * inv_2s2
            dp = y_t[None, :, :] - pm.reshape(KP, KP, G)
            ep = econst - dp * dp * inv_2s2
            return es, e0, e1, ep

        for s in range(ch):
            def step(s=s):
                es, e0, e1, ep = em_at(s)
                nvs, nv0, nv1, nvp = fstep(
                    vs_s[0:1, :], v0s[...], v1s[...], vps[...],
                    es, e0, e1, ep)
                vs_s[0:1, :] = nvs
                v0s[...] = nv0
                v1s[...] = nv1
                vps[...] = nvp

            if s == 0:
                @pl.when(c == 0)
                def _init():
                    es, e0, e1, ep = em_at(0)
                    hi = hi_ref[0, 0:1, :]
                    st = fstep(en_s_ref[0, 0:1, :], en_0_ref[0],
                               en_1_ref[0],
                               en_p_ref[0].reshape(KP, KP, G),
                               es, e0, e1, ep)
                    vs_s[0:1, :] = jnp.where(hi > 0, st[0], es)
                    v0s[...] = jnp.where(hi > 0, st[1],
                                         jnp.where(mask1, e0, NEG))
                    v1s[...] = jnp.where(hi > 0, st[2],
                                         jnp.where(mask1, e1, NEG))
                    vps[...] = jnp.where(hi > 0, st[3],
                                         jnp.where(maskp, ep, NEG))

                @pl.when(c > 0)
                def _():
                    step()
            else:
                step()

        cps_ref[0, :, :] = jnp.broadcast_to(vs_s[0:1, :], (8, G))
        cp0_ref[0, :, :] = v0s[...]
        cp1_ref[0, :, :] = v1s[...]
        cpp_ref[0, :, :] = vps[...].reshape(KP * KP, G)

    return kernel


def _make_ov2_gamma_kernel(Km1: int, Wc: int, ch: int, emit_gamma: bool,
                           per_lane: bool = False):
    def kernel(*args):
        (y_ref, cps_ref, cp0_ref, cp1_ref, cpp_ref, consts_ref,
         b0m_ref, b1m_ref, pm_ref,
         en_s_ref, en_0_ref, en_1_ref, en_p_ref, hi_ref,
         ex_s_ref, ex_0_ref, ex_1_ref, ex_p_ref, term_ref,
         *rest) = args
        if emit_gamma:
            (gam_ref, o_s_ref, o_0_ref, o_1_ref, o_p_ref,
             bs_s, b0s, b1s, bps, ems_s, em0s, em1s, emps,
             ral_s, ral_0, ral_1, ral_p) = rest
        else:
            (o_s_ref, o_0_ref, o_1_ref, o_p_ref,
             bs_s, b0s, b1s, bps, ems_s, em0s, em1s, emps,
             ral_s, ral_0, ral_1, ral_p) = rest
        c = pl.program_id(1)
        cc = Wc - 1 - c
        (lpz, log_sigma, inv_2s2, silent_mean, lp0,
         lp1) = _read_params(consts_ref, per_lane)
        econst = -HALF_LOG_2PI - log_sigma
        tabs = _make_tables(Km1)
        sub2, seg3, sub3, mask1, maskp = tabs
        fstep = _make_fstep(Km1, lp0, lp1, lpz, tabs)
        bstep = _make_bstep(Km1, lp0, lp1, lpz, tabs)
        b0m = b0m_ref[0]
        b1m = b1m_ref[0]
        pm = pm_ref[0]

        def em_at(s):
            y_t = y_ref[0, s : s + 1, :]
            es = econst - (y_t - silent_mean) ** 2 * inv_2s2
            e0 = econst - (y_t - b0m) ** 2 * inv_2s2
            e1 = econst - (y_t - b1m) ** 2 * inv_2s2
            dp = y_t[None, :, :] - pm.reshape(KP, KP, G)
            ep = econst - dp * dp * inv_2s2
            return es, e0, e1, ep

        # --- remat this chunk's alphas (entry-aware at actual chunk 0)
        for s in range(ch):
            if s == 0:
                @pl.when(c == Wc - 1)
                def _remat_init():
                    es, e0, e1, ep = em_at(0)
                    hi = hi_ref[0, 0:1, :]
                    st = fstep(en_s_ref[0, 0:1, :], en_0_ref[0],
                               en_1_ref[0],
                               en_p_ref[0].reshape(KP, KP, G),
                               es, e0, e1, ep)
                    ral_s[0:1, :] = jnp.where(hi > 0, st[0], es)
                    ral_0[0:KP, :] = jnp.where(hi > 0, st[1],
                                               jnp.where(mask1, e0, NEG))
                    ral_1[0:KP, :] = jnp.where(hi > 0, st[2],
                                               jnp.where(mask1, e1, NEG))
                    ral_p[0 : KP * KP, :] = jnp.where(
                        hi > 0, st[3],
                        jnp.where(maskp, ep, NEG)).reshape(KP * KP, G)

                @pl.when(c < Wc - 1)
                def _remat_carry():
                    es, e0, e1, ep = em_at(0)
                    st = fstep(cps_ref[0, 0:1, :], cp0_ref[0],
                               cp1_ref[0],
                               cpp_ref[0].reshape(KP, KP, G),
                               es, e0, e1, ep)
                    ral_s[0:1, :] = st[0]
                    ral_0[0:KP, :] = st[1]
                    ral_1[0:KP, :] = st[2]
                    ral_p[0 : KP * KP, :] = st[3].reshape(KP * KP, G)
            else:
                es, e0, e1, ep = em_at(s)
                st = fstep(ral_s[s - 1 : s, :],
                           ral_0[(s - 1) * KP : s * KP, :],
                           ral_1[(s - 1) * KP : s * KP, :],
                           ral_p[(s - 1) * KP * KP : s * KP * KP,
                                 :].reshape(KP, KP, G),
                           es, e0, e1, ep)
                ral_s[s : s + 1, :] = st[0]
                ral_0[s * KP : (s + 1) * KP, :] = st[1]
                ral_1[s * KP : (s + 1) * KP, :] = st[2]
                ral_p[s * KP * KP : (s + 1) * KP * KP, :] = (
                    st[3].reshape(KP * KP, G))

        term = term_ref[0, 0:1, :]
        zero1 = jnp.zeros((1, G), jnp.float32)
        zkp = jnp.where(mask1, 0.0, NEG)
        zpp = jnp.where(maskp, 0.0, NEG)

        # terminal beta: the exit refs hold beta AT the terminal
        # position, precomputed by the driver (one batched XLA bstep
        # through the boundary emission — which belongs to the NEXT
        # window and, in the drift-tracked case, to ITS parameters;
        # zeros for the true last window)
        tm_s = ex_s_ref[0, 0:1, :]
        tm_0 = jnp.where(mask1, ex_0_ref[0], NEG)
        tm_1 = jnp.where(mask1, ex_1_ref[0], NEG)
        tm_p = jnp.where(maskp, ex_p_ref[0].reshape(KP, KP, G), NEG)

        for s in range(ch - 1, -1, -1):
            def tail(s, nbs, nb0, nb1, nbp, a_s, a_0, a_1, a_p,
                     es, e0, e1, ep):
                if emit_gamma:
                    t_s = a_s + nbs
                    t_0 = a_0 + nb0
                    t_1 = a_1 + nb1
                    t_p = a_p + nbp
                    m = jnp.maximum(
                        jnp.maximum(jnp.max(t_0, axis=0, keepdims=True),
                                    jnp.max(t_1, axis=0, keepdims=True)),
                        jnp.maximum(jnp.max(t_p, axis=(0, 1))[None, :],
                                    t_s))
                    z = m + jnp.log(
                        jnp.exp(t_s - m)
                        + jnp.sum(jnp.exp(t_0 - m), axis=0,
                                  keepdims=True)
                        + jnp.sum(jnp.exp(t_1 - m), axis=0,
                                  keepdims=True)
                        + jnp.sum(jnp.exp(t_p - m[None, :, :]),
                                  axis=(0, 1))[None, :])
                    on0 = (jnp.exp(t_0[0:1, :] - z)
                           + jnp.sum(jnp.exp(t_p[0] - z), axis=0,
                                     keepdims=True))
                    on1 = (jnp.exp(t_1[0:1, :] - z)
                           + jnp.sum(jnp.exp(t_p[:, 0, :] - z), axis=0,
                                     keepdims=True))
                    rows = [on0, on1] + [zero1] * (NR - 2)
                    gam_ref[0, s * NR : (s + 1) * NR, :] = (
                        jnp.concatenate(rows, axis=0))
                bs_s[0:1, :] = nbs
                b0s[...] = nb0
                b1s[...] = nb1
                bps[...] = nbp
                ems_s[0:1, :] = es
                em0s[...] = e0
                em1s[...] = e1
                emps[...] = ep

            def step(s=s, first_step=False):
                t = cc * ch + s
                es, e0, e1, ep = em_at(s)
                a_s = ral_s[s : s + 1, :]
                a_0 = ral_0[s * KP : (s + 1) * KP, :]
                a_1 = ral_1[s * KP : (s + 1) * KP, :]
                a_p = ral_p[s * KP * KP : (s + 1) * KP * KP,
                            :].reshape(KP, KP, G)
                if first_step:
                    st = (zero1, zkp, zkp, zpp)
                else:
                    st = bstep(bs_s[0:1, :], b0s[...], b1s[...],
                               bps[...], ems_s[0:1, :], em0s[...],
                               em1s[...], emps[...])
                is_term = t == term
                nbs = jnp.where(is_term, tm_s, st[0])
                nb0 = jnp.where(is_term, tm_0, st[1])
                nb1 = jnp.where(is_term, tm_1, st[2])
                nbp = jnp.where(is_term, tm_p, st[3])
                tail(s, nbs, nb0, nb1, nbp, a_s, a_0, a_1, a_p,
                     es, e0, e1, ep)

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
            o_s_ref[0] = bs_s[0:1, :]
            o_0_ref[0] = b0s[...]
            o_1_ref[0] = b1s[...]
            o_p_ref[0] = bps[...].reshape(KP * KP, G)

    return kernel


def _pack(x, B, Bg):
    Bp = Bg * G
    R = x.shape[1]
    xp = jnp.zeros((Bp, R), x.dtype).at[:B].set(x)
    return xp.reshape(Bg, G, R).transpose(0, 2, 1)


def _unpack(x, B):
    Bg, R, _ = x.shape
    return x.transpose(0, 2, 1).reshape(Bg * G, R)[:B]


@partial(jax.jit, static_argnames=("L", "refine", "interpret",
                                   "per_lane"))
def _gamma_ov2_impl(y_pad, lp, mu, sigma, n_valid, *, L, refine,
                    interpret=False, per_lane=False):
    """per_lane=False: shared (lp (2,), mu (K, 2), sigma ()). per_lane=
    True (the drift-tracked posteriors): per-window lp (B, 2),
    mu (B, K, 2), sigma (B,) — each lane's tables/weights are its own
    window's, and the chained handoffs realize the exact
    piecewise-parameter forward-backward."""
    K = mu.shape[-2]
    Km1 = K - 1
    dtype = jnp.float32
    SPG = KP * KP

    lp = jnp.asarray(lp, dtype)
    mu = jnp.asarray(mu, dtype)
    sigma = jnp.asarray(sigma, dtype)

    BL = y_pad.shape[0]
    B = BL // L
    Bg = _round_up(B, G) // G
    Bp = Bg * G
    ch = CH2
    Wc = L // ch

    if per_lane:
        lpz_w = jnp.log1p(-jnp.exp(jnp.sum(lp, axis=1)))       # (B,)
        rows = jnp.stack([lpz_w, jnp.log(sigma),
                          1.0 / (2.0 * sigma * sigma),
                          mu[:, 0, 0] + mu[:, 0, 1],
                          lp[:, 0], lp[:, 1],
                          jnp.zeros_like(sigma),
                          jnp.zeros_like(sigma)], axis=1)      # (B, 8)
        # pad lanes get benign finite params (lanes never mix)
        pad_row = jnp.asarray([-0.15, 0.0, 0.5, 0.0, -1.0, -1.0,
                               0.0, 0.0], dtype)
        rows_p = jnp.broadcast_to(pad_row, (Bp, 8)).at[:B].set(rows)
        consts = rows_p.reshape(Bg, G, 8).transpose(0, 2, 1)   # (Bg,8,G)
        b0m = _pack(jnp.zeros((B, KP), dtype).at[:, :Km1].set(
            mu[:, 1:, 0] + mu[:, 0, 1][:, None]), B, Bg)
        b1m = _pack(jnp.zeros((B, KP), dtype).at[:, :Km1].set(
            mu[:, 1:, 1] + mu[:, 0, 0][:, None]), B, Bg)
        pm = _pack(jnp.zeros((B, KP, KP), dtype).at[:, :Km1, :Km1].set(
            mu[:, 1:, 0][:, :, None] + mu[:, 1:, 1][:, None, :]
        ).reshape(B, SPG), B, Bg)
    else:
        lpz = jnp.log1p(-jnp.exp(jnp.sum(lp)))
        consts = jnp.stack([lpz, jnp.log(sigma),
                            1.0 / (2.0 * sigma * sigma),
                            mu[0, 0] + mu[0, 1], lp[0], lp[1], 0.0,
                            0.0])[None, :]
        b0m = jnp.zeros((KP, 1), dtype).at[:Km1, 0].set(
            mu[1:, 0] + mu[0, 1])
        b1m = jnp.zeros((KP, 1), dtype).at[:Km1, 0].set(
            mu[1:, 1] + mu[0, 0])
        pmg = jnp.zeros((KP, KP), dtype).at[:Km1, :Km1].set(
            mu[1:, 0][:, None] + mu[1:, 1][None, :])
        b0m = jnp.broadcast_to(b0m, (KP, G))[None]         # (1, KP, G)
        b1m = jnp.broadcast_to(b1m, (KP, G))[None]
        pm = jnp.broadcast_to(pmg.reshape(SPG, 1), (SPG, G))[None]

    ypp = jnp.zeros((Bp, L), dtype).at[:B].set(
        y_pad.astype(dtype).reshape(B, L))
    y_in = ypp.reshape(Bg, G, L).transpose(0, 2, 1)

    w_end = jnp.minimum((jnp.arange(B) + 1) * L, n_valid) - 1
    term = jnp.where(w_end >= jnp.arange(B) * L,
                     w_end - jnp.arange(B) * L, -1).astype(jnp.int32)
    term_in = _pack(term[:, None].astype(dtype), B,
                    Bg).astype(jnp.int32).reshape(Bg, 1, G)
    ybnd = jnp.concatenate([y_pad.astype(dtype),
                            jnp.zeros((1,), dtype)])[
        (jnp.arange(B) + 1) * L]
    is_last = (jnp.arange(B) == B - 1)

    zs = jnp.zeros((B, 1), dtype)
    z0 = jnp.zeros((B, KP), dtype)
    zp = jnp.zeros((B, SPG), dtype)

    def terminal_exits(ex):
        """Exit states (beta at the next window's first position) ->
        beta AT each window's terminal position: one batched XLA bstep
        through the boundary sample (owned by the NEXT window — under
        ITS parameters in the per-lane case); zeros for the true last
        window (beta[T-1] = 0 exactly)."""
        from ..core.posterior import _ov2_fb_block

        flat = jnp.concatenate(
            [ex[0], ex[1][:, :Km1], ex[2][:, :Km1],
             ex[3].reshape(B, KP, KP)[:, :Km1, :Km1].reshape(B, -1)],
            axis=1)

        if per_lane:
            lp_x = jnp.concatenate([lp[1:], lp[-1:]])
            mu_x = jnp.concatenate([mu[1:], mu[-1:]])
            sg_x = jnp.concatenate([sigma[1:], sigma[-1:]])

            def one(cf, yb, lpb, mub, sgb):
                c, _ = _ov2_fb_block(cf, yb[None], lpb, mub, sgb,
                                     first=False, reverse=True)
                return c

            tf = jax.vmap(one)(flat, ybnd, lp_x, mu_x, sg_x)
        else:
            def one(cf, yb):
                c, _ = _ov2_fb_block(cf, yb[None], lp, mu, sigma,
                                     first=False, reverse=True)
                return c

            tf = jax.vmap(one)(flat, ybnd)
        tf = jnp.where(is_last[:, None], 0.0, tf)
        S1 = 1 + Km1
        S2 = 1 + 2 * Km1
        t0 = jnp.zeros((B, KP), dtype).at[:, :Km1].set(tf[:, 1:S1])
        t1 = jnp.zeros((B, KP), dtype).at[:, :Km1].set(tf[:, S1:S2])
        tp = jnp.zeros((B, KP, KP), dtype).at[:, :Km1, :Km1].set(
            tf[:, S2:].reshape(B, Km1, Km1)).reshape(B, SPG)
        return (tf[:, 0:1], t0, t1, tp)

    row_spec = lambda R: pl.BlockSpec((1, R, G), lambda b, c: (b, 0, 0),
                                      memory_space=pltpu.VMEM)
    pmap = ((lambda b, c: (b, 0, 0)) if per_lane
            else (lambda b, c: (0, 0, 0)))
    if per_lane:
        consts_spec = pl.BlockSpec((1, 8, G), lambda b, c: (b, 0, 0),
                                   memory_space=pltpu.VMEM)
    else:
        consts_spec = pl.BlockSpec((1, 8), lambda b, c: (0, 0),
                                   memory_space=pltpu.SMEM)
    tbl_specs = [
        consts_spec,
        pl.BlockSpec((1, KP, G), pmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, KP, G), pmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, SPG, G), pmap, memory_space=pltpu.VMEM),
    ]

    def fwd(en, has_init):
        kernel = _make_ov2_fwd_kernel(Km1, ch, per_lane)
        in_specs = [
            pl.BlockSpec((1, ch, G), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            *tbl_specs,
            row_spec(1), row_spec(KP), row_spec(KP), row_spec(SPG),
            row_spec(1),
        ]
        out_specs = [
            pl.BlockSpec((1, 8, G), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KP, G), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KP, G), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SPG, G), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((Bg, Wc * 8, G), jnp.float32),
            jax.ShapeDtypeStruct((Bg, Wc * KP, G), jnp.float32),
            jax.ShapeDtypeStruct((Bg, Wc * KP, G), jnp.float32),
            jax.ShapeDtypeStruct((Bg, Wc * SPG, G), jnp.float32),
        ]
        scratch = [pltpu.VMEM((8, G), jnp.float32),
                   pltpu.VMEM((KP, G), jnp.float32),
                   pltpu.VMEM((KP, G), jnp.float32),
                   pltpu.VMEM((KP, KP, G), jnp.float32)]
        hi_in = _pack(has_init[:, None].astype(dtype), B,
                      Bg).astype(jnp.int32).reshape(Bg, 1, G)
        return pl.pallas_call(
            kernel, out_shape=out_shape, grid=(Bg, Wc),
            in_specs=in_specs, out_specs=out_specs,
            scratch_shapes=scratch, interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=VMEM_LIMIT),
        )(y_in, consts, b0m, b1m, pm,
          _pack(en[0], B, Bg).reshape(Bg, 1, G), _pack(en[1], B, Bg),
          _pack(en[2], B, Bg), _pack(en[3], B, Bg), hi_in)

    def bwd(cps, cp0, cp1, cpp, en, has_init, ex, emit_gamma):
        kernel = _make_ov2_gamma_kernel(Km1, Wc, ch, emit_gamma,
                                        per_lane)
        rev = lambda b, c: (b, Wc - 1 - c, 0)
        rev_prev = lambda b, c: (b, jnp.maximum(Wc - 2 - c, 0), 0)
        in_specs = [
            pl.BlockSpec((1, ch, G), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, G), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KP, G), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KP, G), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SPG, G), rev_prev, memory_space=pltpu.VMEM),
            *tbl_specs,
            row_spec(1), row_spec(KP), row_spec(KP), row_spec(SPG),
            row_spec(1),
            row_spec(1), row_spec(KP), row_spec(KP), row_spec(SPG),
            row_spec(1),
        ]
        out_specs = [row_spec(1), row_spec(KP), row_spec(KP),
                     row_spec(SPG)]
        out_shape = [
            jax.ShapeDtypeStruct((Bg, 1, G), jnp.float32),
            jax.ShapeDtypeStruct((Bg, KP, G), jnp.float32),
            jax.ShapeDtypeStruct((Bg, KP, G), jnp.float32),
            jax.ShapeDtypeStruct((Bg, SPG, G), jnp.float32),
        ]
        if emit_gamma:
            out_specs = [pl.BlockSpec((1, ch * NR, G), rev,
                                      memory_space=pltpu.VMEM)] + out_specs
            out_shape = [jax.ShapeDtypeStruct((Bg, L * NR, G),
                                              jnp.float32)] + out_shape
        scratch = [
            pltpu.VMEM((8, G), jnp.float32),
            pltpu.VMEM((KP, G), jnp.float32),
            pltpu.VMEM((KP, G), jnp.float32),
            pltpu.VMEM((KP, KP, G), jnp.float32),
            pltpu.VMEM((8, G), jnp.float32),
            pltpu.VMEM((KP, G), jnp.float32),
            pltpu.VMEM((KP, G), jnp.float32),
            pltpu.VMEM((KP, KP, G), jnp.float32),
            pltpu.VMEM((ch, G), jnp.float32),
            pltpu.VMEM((ch * KP, G), jnp.float32),
            pltpu.VMEM((ch * KP, G), jnp.float32),
            pltpu.VMEM((ch * KP * KP, G), jnp.float32),
        ]
        hi_in = _pack(has_init[:, None].astype(dtype), B,
                      Bg).astype(jnp.int32).reshape(Bg, 1, G)
        return pl.pallas_call(
            kernel, out_shape=out_shape, grid=(Bg, Wc),
            in_specs=in_specs, out_specs=out_specs,
            scratch_shapes=scratch, interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
                vmem_limit_bytes=VMEM_LIMIT),
        )(y_in, cps, cp0, cp1, cpp, consts, b0m, b1m, pm,
          _pack(en[0], B, Bg).reshape(Bg, 1, G), _pack(en[1], B, Bg),
          _pack(en[2], B, Bg), _pack(en[3], B, Bg), hi_in,
          _pack(ex[0], B, Bg).reshape(Bg, 1, G), _pack(ex[1], B, Bg),
          _pack(ex[2], B, Bg), _pack(ex[3], B, Bg), term_in)

    def terminals(cps, cp0, cp1, cpp):
        return (_unpack(cps[:, (Wc - 1) * 8 : (Wc - 1) * 8 + 1, :], B),
                _unpack(cp0[:, (Wc - 1) * KP : Wc * KP, :], B),
                _unpack(cp1[:, (Wc - 1) * KP : Wc * KP, :], B),
                _unpack(cpp[:, (Wc - 1) * SPG : Wc * SPG, :], B))

    def recenter(st):
        m = jnp.maximum(
            jnp.maximum(jnp.max(st[1], axis=1, keepdims=True),
                        jnp.max(st[2], axis=1, keepdims=True)),
            jnp.maximum(jnp.max(st[3], axis=1, keepdims=True), st[0]))
        return tuple(v - m for v in st)

    def shift_down(st):
        return tuple(jnp.concatenate([z[:1], v[:-1]])
                     for z, v in zip((zs, z0, z0, zp), st))

    def shift_up(st):
        return tuple(jnp.concatenate([v[1:], z[:1]])
                     for z, v in zip((zs, z0, z0, zp), st))

    no_init = jnp.zeros((B,), jnp.int32)
    chained = (jnp.arange(B) > 0).astype(jnp.int32)
    zst = (zs, z0, z0, zp)

    cps, cp0, cp1, cpp = fwd(zst, no_init)
    en = shift_down(recenter(terminals(cps, cp0, cp1, cpp)))
    for _ in range(max(0, refine - 1)):
        cps, cp0, cp1, cpp = fwd(en, chained)
        en = shift_down(recenter(terminals(cps, cp0, cp1, cpp)))
    cps, cp0, cp1, cpp = fwd(en, chained)

    outs = bwd(cps, cp0, cp1, cpp, en, chained, terminal_exits(zst),
               emit_gamma=False)
    ex = shift_up(recenter(tuple(_unpack(o, B) for o in outs)))
    for _ in range(max(0, refine - 1)):
        outs = bwd(cps, cp0, cp1, cpp, en, chained, terminal_exits(ex),
                   emit_gamma=False)
        ex = shift_up(recenter(tuple(_unpack(o, B) for o in outs)))

    gam = bwd(cps, cp0, cp1, cpp, en, chained, terminal_exits(ex),
              emit_gamma=True)[0]
    gam = gam.reshape(Bg, L, NR, G).transpose(0, 3, 1, 2).reshape(
        Bp * L, NR)[: B * L, :2]
    return gam


def onset_gammas_pallas_ov2_tracked(y, lp_all, mu_all, sg_all, *,
                                    L: int = 4096, refine: int = 1,
                                    interpret: bool = False
                                    ) -> np.ndarray:
    """(T, 2) EXACT onset posteriors under PER-WINDOW parameters (the
    drift-tracked confidence path): window b = y[bL:(b+1)L] is evaluated
    under (lp_all[b], mu_all[b], sg_all[b]) and the chained handoffs
    realize the exact piecewise-parameter forward-backward (each lane
    carries its own tables; the boundary bstep runs under the NEXT
    window's parameters, matching train/adaptive's owner convention)."""
    y = np.asarray(y)
    T = y.shape[0]
    lp_all = np.asarray(lp_all)
    mu_all = np.asarray(mu_all)
    sg_all = np.asarray(sg_all)
    B, K, N = mu_all.shape
    if N != 2:
        raise ValueError("ov2 gamma kernel requires exactly 2 templates")
    if K - 1 > KP:
        raise ValueError(f"ov2 gamma kernel supports K <= {KP + 1}")
    if L % CH2 != 0:
        raise ValueError(f"L={L} must be a multiple of {CH2}")
    if B != -(-T // L) or B < 2:
        raise ValueError(f"need one parameter row per window "
                         f"(B={B} vs ceil(T/L)={-(-T // L)})")
    y_pad = np.zeros(B * L, dtype=y.dtype)
    y_pad[:T] = y
    gam = _gamma_ov2_impl(jnp.asarray(y_pad), jnp.asarray(lp_all),
                          jnp.asarray(mu_all), jnp.asarray(sg_all),
                          jnp.asarray(T, jnp.int32), L=L, refine=refine,
                          interpret=interpret, per_lane=True)
    return np.asarray(gam)[:T].astype(np.float64)


def ov2_gamma_hbm_bytes(T: int, L: int = 4096) -> int:
    """HBM footprint estimate: the chunk-boundary state checkpoints
    dominate ((T/CH2) * ~17 KB — 4.4 GB at T=2^21, measured to fit on
    16 GB v5e) plus the gamma output and padded inputs."""
    B = -(-T // L)
    state_rows = 8 + 2 * KP + KP * KP
    return (B * (L // CH2) * state_rows * 4        # checkpoints
            + B * L * NR * 4                       # gamma output
            + 4 * B * L * 4)                       # y + small per-lane refs


def ov2_gamma_hbm_ok(T: int, L: int = 4096,
                     budget: int = 10 * 2**30) -> bool:
    """Conservative fit check against v5e's 16 GB HBM (the XLA chained
    engines stay memory-bounded via batching and take over past this)."""
    return ov2_gamma_hbm_bytes(T, L) <= budget


def ov2_gamma_vmem_bytes() -> int:
    """Scoped-VMEM estimate of the gamma kernel's live set: remat alpha
    slabs (the pair grid dominates), beta + emission-cache scratch, and
    the double-buffered checkpoint/boundary input blocks."""
    SPG = KP * KP
    rows = (CH2 * (1 + 2 * KP + SPG)        # remat alpha slabs
            + 2 * (8 + 2 * KP + SPG)        # beta state + em caches
            + 2 * (8 + 2 * KP + SPG)        # checkpoint blocks (dbl buf)
            + 3 * SPG + 6 * KP + 16         # entry/exit/boundary refs
            + CH2 * NR + 2 * CH2)           # gamma out + y blocks
    return rows * G * 4


def ov2_gamma_vmem_ok(ceiling: int | None = None) -> bool:
    from .pallas_viterbi_ovn_mb import VMEM_SLOP, _gate_ceiling

    if ceiling is None:
        ceiling = _gate_ceiling()
    return ov2_gamma_vmem_bytes() * VMEM_SLOP <= ceiling


def onset_gammas_pallas_ov2(y, lp, mu, sigma, *, L: int = 4096,
                            refine: int = 1,
                            interpret: bool = False) -> np.ndarray:
    """(T, 2) EXACT onset posteriors on the N=2 pairwise-overlap
    topology via the fused chained-window kernels (the production
    confidence/QC path at S = 3600). Requires N == 2, K <= KP+1, L a
    multiple of CH2, B >= 2 windows."""
    y = np.asarray(y)
    T = y.shape[0]
    K, N = np.shape(mu)
    if N != 2:
        raise ValueError("ov2 gamma kernel requires exactly 2 templates")
    if K - 1 > KP:
        raise ValueError(f"ov2 gamma kernel supports K <= {KP + 1}")
    if L % CH2 != 0:
        raise ValueError(f"L={L} must be a multiple of {CH2}")
    B = -(-T // L)
    if B < 2:
        raise ValueError("signal shorter than two windows")
    y_pad = np.zeros(B * L, dtype=y.dtype)
    y_pad[:T] = y
    gam = _gamma_ov2_impl(jnp.asarray(y_pad), jnp.asarray(lp),
                          jnp.asarray(mu), jnp.asarray(sigma),
                          jnp.asarray(T, jnp.int32), L=L, refine=refine,
                          interpret=interpret)
    return np.asarray(gam)[:T].astype(np.float64)
