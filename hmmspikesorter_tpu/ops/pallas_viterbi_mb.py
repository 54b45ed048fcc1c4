"""Pallas TPU kernel, multi-block layout: fused emission + max-plus Viterbi
forward for the N=2 pairwise-overlap ring space (the production decode
topology), G overlap-save blocks per program on the VPU *lane* axis.

Why this layout: the round-1 kernel (ops/pallas_viterbi.py) put one block
per grid program — grid programs execute serially on a TPU core, so the
block axis contributed zero parallelism and the kernel lost ~10x to the
vmapped XLA scan. Here the block axis IS the lane axis:

    vs   (8, G)          all-silent score, row 0 live      (VMEM scratch)
    v0   (KP, G)         single-active neuron 0, sublane k = ring slot k
    v1   (KP, G)         single-active neuron 1
    vp   (KP, KP, G)     pair grid, (segment k1, sublane k2, lane block)

with KP = K-1 padded to 64 and G = 128 blocks filling every lane. Every
structural read the recursion needs is now a static slice or a sublane
roll — no transposes, no gathers:

  * ring shifts and onset handoffs: pltpu.roll along sublanes;
  * the pair diagonal shift vp[k1,k2] <- vp[k1-1,k2-1]: one roll by KP+1
    on the (KP*KP, G) flattened view (the wrapped rows land exactly on
    the k1=0 row and k2=0 column that the onset injections overwrite);
  * pair last row vp[K-2, :, :]: a static segment slice; pair last
    column: a sublane reduction per segment.

Versus the XLA ring scan, the win is layout + fusion: XLA lays the
(B, K-1, K-1) pair grid with K-1 = 59 on the 128-lane axis (2.2x lane
padding waste) and materializes the scan carry between fused ops; this
kernel wastes zero lanes and keeps all state resident in VMEM across the
whole window.

The grid is (B/G, W/CH): the chunk axis streams backpointer flags to HBM
in (CH, ...) slabs with all stores at static offsets; state lives in
scratch, which persists across the sequential grid (re-initialized at
chunk 0 of each block group).

Reference semantics preserved exactly as in ops/ring_viterbi.py:
emission-only init (+ forced silent start per-block on request), strict
first-max tie-breaks in in-edge source order (src/viterbi.jl:56-84). The
XLA backtrace over the flag outputs mirrors ring_viterbi_ov2's and the
labels bit-match it (tested in interpret mode; validated on TPU by
scripts/tpu_parity.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.logmath import HALF_LOG_2PI

NEG = -3.0e38
G = 128          # blocks per program == VPU lanes
KP = 64          # padded ring dimension (K-1 <= 64, i.e. K <= 65)
CH = 32          # window steps per grid chunk


def _round_up(x, m):
    return -(-x // m) * m


def _make_kernel(Km1: int, Wc: int, per_lane: bool = False):
    def kernel(y_ref, consts_ref, b0m_ref, b1m_ref, pm_ref, sil_ref,
               flags_ref, rings_ref, vsT_ref, v0T_ref, v1T_ref, vpT_ref,
               vs_s, v0s, v1s, vps):
        c = pl.program_id(1)
        if per_lane:
            # drift-tracked decode: each LANE (= window) carries its own
            # parameters as (1, G) rows; every use below broadcasts over
            # the leading state dims, so the score math is unchanged
            lp0 = consts_ref[0, 0:1, :]
            lp1 = consts_ref[0, 1:2, :]
            lpz = consts_ref[0, 2:3, :]
            log_sigma = consts_ref[0, 3:4, :]
            inv_2s2 = consts_ref[0, 4:5, :]
            silent_mean = consts_ref[0, 5:6, :]
        else:
            lp0 = consts_ref[0, 0]
            lp1 = consts_ref[0, 1]
            lpz = consts_ref[0, 2]
            log_sigma = consts_ref[0, 3]
            inv_2s2 = consts_ref[0, 4]
            silent_mean = consts_ref[0, 5]

        sub1 = jax.lax.broadcasted_iota(jnp.int32, (KP, G), 0)
        seg3 = jax.lax.broadcasted_iota(jnp.int32, (KP, KP, G), 0)
        sub3 = jax.lax.broadcasted_iota(jnp.int32, (KP, KP, G), 1)
        mask1 = sub1 < Km1
        maskp = (seg3 < Km1) & (sub3 < Km1)
        econst = -HALF_LOG_2PI - log_sigma

        def em_all(y_t):
            # y_t: (1, G). Means are pre-broadcast over lanes (shared) or
            # per-lane columns (tracked).
            b0m = b0m_ref[0] if per_lane else b0m_ref[...]
            b1m = b1m_ref[0] if per_lane else b1m_ref[...]
            pm = pm_ref[0] if per_lane else pm_ref[...]
            es = econst - (y_t - silent_mean) ** 2 * inv_2s2      # (1, G)
            d0 = y_t - b0m                                        # (KP, G)
            d1 = y_t - b1m
            dp = y_t[None, :, :] - pm.reshape(KP, KP, G)
            return (es, econst - d0 * d0 * inv_2s2,
                    econst - d1 * d1 * inv_2s2,
                    econst - dp * dp * inv_2s2)

        @pl.when(c == 0)
        def _init():
            y0 = y_ref[0, 0:1, :]                                 # (1, G)
            es, e0, e1, ep = em_all(y0)
            sil = sil_ref[0, 0:1, :]                              # (1, G) i32
            vs_s[0:1, :] = jnp.where(sil > 0, jnp.float32(0.0), es)
            v0s[...] = jnp.where(mask1, e0, NEG)
            v1s[...] = jnp.where(mask1, e1, NEG)
            vps[...] = jnp.where(maskp, ep, NEG)

        for s in range(CH):
            def step(s=s):
                vs = vs_s[0:1, :]                                 # (1, G)
                v0 = v0s[...]
                v1 = v1s[...]
                vp = vps[...]
                y_t = y_ref[0, s : s + 1, :]
                es, e0, e1, ep = em_all(y_t)

                end_row = sub1 == Km1 - 1
                end0 = jnp.max(jnp.where(end_row, v0, NEG), axis=0,
                               keepdims=True)                     # (1, G)
                end1 = jnp.max(jnp.where(end_row, v1, NEG), axis=0,
                               keepdims=True)
                lastcol = jnp.max(jnp.where(sub3 == Km1 - 1, vp, NEG),
                                  axis=1)                         # (KP, G) k1
                lastrow = vp[Km1 - 1]                             # (KP, G) k2
                pair_end = jnp.max(jnp.where(end_row, lastrow, NEG),
                                   axis=0, keepdims=True)         # (1, G)

                # silent target; first-max over source-ordered candidates
                c0 = vs + 2.0 * lpz
                c1 = end0 + lpz
                c2 = end1 + lpz
                c3 = pair_end
                new_vs = jnp.maximum(jnp.maximum(c0, c1),
                                     jnp.maximum(c2, c3)) + es
                bp_sil = jnp.where(
                    (c0 >= c1) & (c0 >= c2) & (c0 >= c3), 0,
                    jnp.where((c1 >= c2) & (c1 >= c3), 1,
                              jnp.where(c2 >= c3, 2, 3))).astype(jnp.int32)

                # single onsets (slot 0)
                on0a = vs + lp0 + lpz
                on0b = end1 + lp0
                on1a = vs + lp1 + lpz
                on1b = end0 + lp1
                b0_on = (on0b > on0a).astype(jnp.int32)
                b1_on = (on1b > on1a).astype(jnp.int32)
                on0 = jnp.maximum(on0a, on0b)                     # (1, G)
                on1 = jnp.maximum(on1a, on1b)

                # single ring slots k>=1: same-ring shift vs pair handoff
                v0_sh = pltpu.roll(v0, 1, axis=0) + lpz
                v1_sh = pltpu.roll(v1, 1, axis=0) + lpz
                hand0 = pltpu.roll(lastcol, 1, axis=0)            # pair(k-1,end)
                hand1 = pltpu.roll(lastrow, 1, axis=0)            # pair(end,k-1)
                r0 = jnp.maximum(v0_sh, hand0)
                r1 = jnp.maximum(v1_sh, hand1)
                # Mosaic supports no i8 arithmetic — compute flags in i32
                # and narrow only at the store
                b0r = (hand0 > v0_sh).astype(jnp.int32)
                b1r = (hand1 > v1_sh).astype(jnp.int32)
                new_v0 = jnp.where(sub1 == 0, on0, r0)
                new_v1 = jnp.where(sub1 == 0, on1, r1)
                new_v0 = jnp.where(mask1, new_v0 + e0, NEG)
                new_v1 = jnp.where(mask1, new_v1 + e1, NEG)

                # pair grid: diagonal shift == one flattened roll by KP+1
                # (wrapped rows land on the k1=0 / k2=0 cells overwritten
                # by the injections below)
                flat = vp.reshape(KP * KP, G)
                rolled = pltpu.roll(flat, KP + 1, axis=0).reshape(KP, KP, G)
                top = pltpu.roll(v1, 1, axis=0) + lp0             # (KP, G) k2
                top = jnp.where(sub1 == 0, vs + lp0 + lp1, top)
                left = pltpu.roll(v0, 1, axis=0) + lp1            # (KP, G) k1
                new_vp = jnp.where(seg3 == 0, top[None, :, :],
                                   jnp.where(sub3 == 0, left[:, None, :],
                                             rolled))
                new_vp = jnp.where(maskp, new_vp + ep, NEG)

                vs_s[0:1, :] = new_vs
                v0s[...] = new_v0
                v1s[...] = new_v1
                vps[...] = new_vp

                # backpointer outputs — all offsets static
                packed = bp_sil + 4 * (b0_on + 2 * b1_on)         # (1, G)
                flags_ref[0, s : s + 1, :] = packed
                rings_ref[0, s * KP : (s + 1) * KP, :] = (
                    b0r + 2 * b1r).astype(jnp.int8)

            if s == 0:
                @pl.when((c > 0) | (s > 0))
                def _():
                    step()
                # chunk 0, step 0 is the init sample: flag slot unused,
                # but the output block must still be written
                @pl.when(c == 0)
                def _():
                    flags_ref[0, 0:1, :] = jnp.zeros((1, G), jnp.int32)
                    rings_ref[0, 0:KP, :] = jnp.zeros((KP, G), jnp.int8)
            else:
                step()

        @pl.when(c == Wc - 1)
        def _final():
            vsT_ref[0] = vs_s[0:1, :]
            v0T_ref[0] = v0s[...]
            v1T_ref[0] = v1s[...]
            vpT_ref[0] = vps[...].reshape(KP * KP, G)

    return kernel


@partial(jax.jit, static_argnames=("silent_start0", "interpret"))
def _forward_native(y_win, lp, mu, sigma, *, silent_start0=True,
                    silent_mask=None, interpret=False):
    """Fused multi-block forward; outputs stay in the kernel's native
    (Bg, ..., G) lane layout (no transposes): flags (Bg, W, G) i32,
    rings (Bg, W*KP, G) i8, vsT (Bg, 1, G), v0T/v1T (Bg, KP, G),
    vpT (Bg, KP*KP, G)."""
    B, W = y_win.shape
    K = jnp.asarray(mu).shape[-2]   # (K, 2) shared / (B, K, 2) per-window
    Km1 = K - 1
    if Km1 > KP:
        raise ValueError(f"multi-block kernel supports K <= {KP + 1}")
    if W % CH != 0:
        raise ValueError(f"W={W} must be a multiple of CH={CH}")
    Wc = W // CH
    Bg = _round_up(B, G) // G
    Bp = Bg * G
    dtype = jnp.float32

    lp = jnp.asarray(lp, dtype)
    mu = jnp.asarray(mu, dtype)
    sigma = jnp.asarray(sigma, dtype)
    per_window = lp.ndim == 2       # (B, 2) / (B, K, 2) / (B,) params:
    #                                 each lane decodes with its own set
    #                                 (the drift-tracked decode)
    if per_window:
        lpz = jnp.log1p(-jnp.exp(jnp.sum(lp, axis=1)))        # (B,)
        rows = jnp.stack([lp[:, 0], lp[:, 1], lpz, jnp.log(sigma),
                          1.0 / (2.0 * sigma * sigma),
                          mu[:, 0, 0] + mu[:, 0, 1],
                          jnp.zeros_like(sigma),
                          jnp.zeros_like(sigma)], axis=1)      # (B, 8)
        # pad lanes get benign finite params (lanes never mix)
        pad_row = jnp.asarray([-1.0, -1.0, -0.15, 0.0, 0.5, 0.0,
                               0.0, 0.0], dtype)
        rows_p = jnp.broadcast_to(pad_row, (Bp, 8)).at[:B].set(rows)
        consts = rows_p.reshape(Bg, G, 8).transpose(0, 2, 1)  # (Bg,8,G)
        b0r = jnp.zeros((Bp, KP), dtype).at[:B, :Km1].set(
            mu[:, 1:, 0] + mu[:, 0, 1][:, None])
        b1r = jnp.zeros((Bp, KP), dtype).at[:B, :Km1].set(
            mu[:, 1:, 1] + mu[:, 0, 0][:, None])
        pmr = jnp.zeros((Bp, KP, KP), dtype).at[:B, :Km1, :Km1].set(
            mu[:, 1:, 0][:, :, None] + mu[:, 1:, 1][:, None, :])
        b0m = b0r.reshape(Bg, G, KP).transpose(0, 2, 1)       # (Bg,KP,G)
        b1m = b1r.reshape(Bg, G, KP).transpose(0, 2, 1)
        pm = pmr.reshape(Bg, G, KP * KP).transpose(0, 2, 1)
    else:
        lpz = jnp.log1p(-jnp.exp(jnp.sum(lp)))
        consts = jnp.stack([lp[0], lp[1], lpz, jnp.log(sigma),
                            1.0 / (2.0 * sigma * sigma),
                            mu[0, 0] + mu[0, 1], 0.0, 0.0])[None, :]
        b0m = jnp.zeros((KP, 1), dtype).at[:Km1, 0].set(
            mu[1:, 0] + mu[0, 1])
        b1m = jnp.zeros((KP, 1), dtype).at[:Km1, 0].set(
            mu[1:, 1] + mu[0, 0])
        pmg = jnp.zeros((KP, KP), dtype).at[:Km1, :Km1].set(
            mu[1:, 0][:, None] + mu[1:, 1][None, :])
        b0m = jnp.broadcast_to(b0m, (KP, G))
        b1m = jnp.broadcast_to(b1m, (KP, G))
        pm = jnp.broadcast_to(pmg.reshape(KP * KP, 1), (KP * KP, G))

    # pack blocks onto lanes: block b_global = bg * G + g
    ypad = jnp.zeros((Bp, W), dtype).at[:B].set(y_win.astype(dtype))
    y_in = ypad.reshape(Bg, G, W).transpose(0, 2, 1)          # (Bg, W, G)
    sil = jnp.zeros((Bp,), jnp.int32)
    if silent_mask is not None:
        sil = sil.at[:B].set(jnp.asarray(silent_mask).astype(jnp.int32))
    elif silent_start0:
        sil = sil.at[0].set(1)
    sil_in = sil.reshape(Bg, G)[:, None, :]                   # (Bg, 1, G)

    kernel = _make_kernel(Km1, Wc, per_lane=per_window)
    grid = (Bg, Wc)
    if per_window:
        param_specs = [
            pl.BlockSpec((1, 8, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KP, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KP, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KP * KP, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    else:
        param_specs = [
            pl.BlockSpec((1, 8), lambda b, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((KP, G), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KP, G), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KP * KP, G), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
    in_specs = [
            pl.BlockSpec((1, CH, G), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            *param_specs,
            pl.BlockSpec((1, 1, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
    ]
    out_specs = [
            pl.BlockSpec((1, CH, G), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CH * KP, G), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KP, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KP, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KP * KP, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((Bg, W, G), jnp.int32),
        jax.ShapeDtypeStruct((Bg, W * KP, G), jnp.int8),
        jax.ShapeDtypeStruct((Bg, 1, G), jnp.float32),
        jax.ShapeDtypeStruct((Bg, KP, G), jnp.float32),
        jax.ShapeDtypeStruct((Bg, KP, G), jnp.float32),
        jax.ShapeDtypeStruct((Bg, KP * KP, G), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((8, G), jnp.float32),
        pltpu.VMEM((KP, G), jnp.float32),
        pltpu.VMEM((KP, G), jnp.float32),
        pltpu.VMEM((KP, KP, G), jnp.float32),
    ]
    flags, rings, vsT, v0T, v1T, vpT = pl.pallas_call(
        kernel, out_shape=out_shape, grid=grid, in_specs=in_specs,
        out_specs=out_specs, scratch_shapes=scratch, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(y_in, consts, b0m, b1m, pm, sil_in)
    return flags, rings, vsT, v0T, v1T, vpT


def ov2_forward_pallas_mb(y_win, lp, mu, sigma, *, silent_start0=True,
                          silent_mask=None, interpret=False):
    """Fused multi-block forward over (B, W) windows.

    B is padded to a multiple of G internally. silent_start0 forces the
    reference's silent start on block 0; silent_mask ((B,) bool, traced)
    overrides it with per-block flags. Returns arrays in (B, ...) layout:
    flags (B, W) i32 [bp_sil | b0_on | b1_on packed], rings (B, W, KP) i8
    [b0r | b1r packed], and final state vectors vsT (B,), v0T/v1T (B, KP),
    vpT (B, KP, KP).
    """
    outs = _forward_native(y_win, lp, mu, sigma, silent_start0=silent_start0,
                           silent_mask=silent_mask, interpret=interpret)
    return _native_to_blockmajor(outs, y_win.shape[0])


def _native_to_blockmajor(outs, B):
    """Unpack lanes back to block-major layout (the big transposes)."""
    flags, rings, vsT, v0T, v1T, vpT = outs
    Bg, W, _ = flags.shape
    Bp = Bg * G
    flags = flags.transpose(0, 2, 1).reshape(Bp, W)[:B]
    rings = rings.reshape(Bg, W, KP, G).transpose(0, 3, 1, 2).reshape(
        Bp, W, KP)[:B]
    vsT = vsT[:, 0, :].reshape(Bp)[:B]
    v0T = v0T.transpose(0, 2, 1).reshape(Bp, KP)[:B]
    v1T = v1T.transpose(0, 2, 1).reshape(Bp, KP)[:B]
    vpT = vpT.reshape(Bg, KP, KP, G).transpose(0, 3, 1, 2).reshape(
        Bp, KP, KP)[:B]
    return flags, rings, vsT, v0T, v1T, vpT


def ov2_decode_pallas_mb(y_win, lp, mu, sigma, *, silent_start0=True,
                         silent_mask=None, interpret=False,
                         fused_backtrace=True):
    """(B, W) windows -> (B, W) int32 labels via the fused multi-block
    forward, then either the lane-parallel Pallas backtrace on the native
    layout (fused_backtrace=True — skips the large flag transposes and the
    serial XLA chase) or the XLA backtrace (identical labels).

    Per-window parameters (lp (B, 2), mu (B, K, 2), sigma (B,)) decode
    each window under its own set — the drift-tracked decode's block
    engine (train/adaptive.py)."""
    K = jnp.asarray(mu).shape[-2]
    Km1 = K - 1
    if not fused_backtrace:
        outs = ov2_forward_pallas_mb(y_win, lp, mu, sigma,
                                     silent_start0=silent_start0,
                                     silent_mask=silent_mask,
                                     interpret=interpret)
        return _backtrace_mb(outs, Km1, y_win.shape[1])

    B, W = y_win.shape
    flags_g, rings_g, vsT_g, v0T_g, v1T_g, vpT_g = _forward_native(
        y_win, lp, mu, sigma, silent_start0=silent_start0,
        silent_mask=silent_mask, interpret=interpret)
    Bg = flags_g.shape[0]
    # per-block termination: first-argmax over the flat state order
    # [silent | n0 ring | n1 ring | pair grid k1-major] (viterbi.jl:90)
    vp4 = vpT_g.reshape(Bg, KP, KP, G)
    flat = jnp.concatenate(
        [vsT_g, v0T_g[:, :Km1, :], v1T_g[:, :Km1, :],
         vp4[:, :Km1, :Km1, :].reshape(Bg, Km1 * Km1, G)], axis=1)
    xT = jnp.argmax(flat, axis=1).astype(jnp.int32)[:, None, :]  # (Bg,1,G)
    labels_g = _backtrace_mb_pallas(flags_g, rings_g, xT, Km1=Km1,
                                    interpret=interpret)
    return labels_g.transpose(0, 2, 1).reshape(Bg * G, W)[:B]


def _make_backtrace_kernel(Km1: int, Wc: int):
    """Lane-parallel backtrace: grid (Bg, Wc) iterated with the chunk axis
    REVERSED via the index maps; the chase state lives in scratch and each
    lane (block) follows its own pointer chain simultaneously. Per step the
    ring-choice flag is read with a one-hot sublane reduction over the
    (KP, G) ring rows — no gathers. Same arithmetic as the XLA backtrace
    (mirroring ring_viterbi_ov2's `back`)."""
    SGL0, SGL1, PAIR = 1, 1 + Km1, 1 + 2 * Km1

    def kernel(flags_ref, rings_ref, xT_ref, lab_ref, x_s):
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _init():
            x_s[0:1, :] = xT_ref[0]

        sub = jax.lax.broadcasted_iota(jnp.int32, (KP, G), 0)
        end0, end1 = SGL0 + Km1 - 1, SGL1 + Km1 - 1
        pair_end = PAIR + (Km1 - 1) * Km1 + (Km1 - 1)

        for s in range(CH - 1, -1, -1):
            def step(s=s):
                x = x_s[0:1, :]                               # (1, G)
                lab_ref[0, s : s + 1, :] = x
                f = flags_ref[0, s : s + 1, :]                # (1, G)
                bp_s = f & 3
                b0o = (f >> 2) & 1
                b1o = f >> 3
                rr = rings_ref[0, s * KP : (s + 1) * KP, :].astype(
                    jnp.int32)                                # (KP, G)

                from_sil = jnp.where(
                    bp_s == 0, 0,
                    jnp.where(bp_s == 1, end0,
                              jnp.where(bp_s == 2, end1, pair_end)))
                j0 = x - SGL0
                c0 = jnp.sum(jnp.where(sub == j0, rr & 1, 0), axis=0,
                             keepdims=True)
                from_s0 = jnp.where(
                    j0 == 0, jnp.where(b0o == 0, 0, end1),
                    jnp.where(c0 == 0, x - 1,
                              PAIR + (j0 - 1) * Km1 + (Km1 - 1)))
                j1 = x - SGL1
                c1 = jnp.sum(jnp.where(sub == j1, rr >> 1, 0), axis=0,
                             keepdims=True)
                from_s1 = jnp.where(
                    j1 == 0, jnp.where(b1o == 0, 0, end0),
                    jnp.where(c1 == 0, x - 1,
                              PAIR + (Km1 - 1) * Km1 + (j1 - 1)))
                jp = x - PAIR
                a = jp // Km1
                b = jp % Km1
                from_p = jnp.where(
                    (a == 0) & (b == 0), 0,
                    jnp.where(b == 0, SGL0 + a - 1,
                              jnp.where(a == 0, SGL1 + b - 1,
                                        x - Km1 - 1)))
                x_prev = jnp.where(
                    x == 0, from_sil,
                    jnp.where(x < SGL1, from_s0,
                              jnp.where(x < PAIR, from_s1, from_p)))
                x_s[0:1, :] = x_prev

            if s == 0:
                # t = chunk_start: only update the chase when t > 0
                @pl.when(c < Wc - 1)
                def _():
                    step()
                @pl.when(c == Wc - 1)
                def _():
                    lab_ref[0, 0:1, :] = x_s[0:1, :]
            else:
                step()

    return kernel


@partial(jax.jit, static_argnames=("Km1", "interpret"))
def _backtrace_mb_pallas(flags_g, rings_g, xT_g, *, Km1: int,
                         interpret=False):
    """Backtrace on the kernel's native (Bg, ..., G) layout.

    flags_g (Bg, W, G) i32; rings_g (Bg, W*KP, G) i8; xT_g (Bg, 1, G) i32.
    Returns labels (Bg, W, G) i32.
    """
    Bg, W, _ = flags_g.shape
    Wc = W // CH
    kernel = _make_backtrace_kernel(Km1, Wc)
    # the chunk axis runs in REVERSE through the index maps
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bg, W, G), jnp.int32),
        grid=(Bg, Wc),
        in_specs=[
            pl.BlockSpec((1, CH, G), lambda b, c: (b, Wc - 1 - c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CH * KP, G), lambda b, c: (b, Wc - 1 - c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, G), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, CH, G), lambda b, c: (b, Wc - 1 - c, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, G), jnp.int32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(flags_g, rings_g, xT_g)


@partial(jax.jit, static_argnames=("Km1", "W"))
def _backtrace_mb(outs, Km1: int, W: int):
    flags, rings, vsT, v0T, v1T, vpT = outs
    B = flags.shape[0]
    SGL0, SGL1, PAIR = 1, 1 + Km1, 1 + 2 * Km1

    flat = jnp.concatenate(
        [vsT[:, None], v0T[:, :Km1], v1T[:, :Km1],
         vpT[:, :Km1, :Km1].reshape(B, -1)], axis=1)
    xT = jnp.argmax(flat, axis=1).astype(jnp.int32)

    ring_iota = jnp.arange(rings.shape[2], dtype=jnp.int32)

    def back(x_next, t):
        f = flags[:, t]
        bp_s = f & 3
        b0o = (f >> 2) & 1
        b1o = f >> 3
        rr = rings[:, t]                                  # (B, KP)
        end0, end1 = SGL0 + Km1 - 1, SGL1 + Km1 - 1
        pair_end = PAIR + (Km1 - 1) * Km1 + (Km1 - 1)

        from_sil = jnp.where(
            bp_s == 0, 0,
            jnp.where(bp_s == 1, end0, jnp.where(bp_s == 2, end1, pair_end)))
        j0 = x_next - SGL0
        c0 = jnp.sum(jnp.where(ring_iota[None, :] == j0[:, None],
                               (rr & 1).astype(jnp.int32), 0), axis=1)
        from_s0 = jnp.where(
            j0 == 0, jnp.where(b0o == 0, 0, end1),
            jnp.where(c0 == 0, x_next - 1,
                      PAIR + (j0 - 1) * Km1 + (Km1 - 1)))
        j1 = x_next - SGL1
        c1 = jnp.sum(jnp.where(ring_iota[None, :] == j1[:, None],
                               (rr >> 1).astype(jnp.int32), 0), axis=1)
        from_s1 = jnp.where(
            j1 == 0, jnp.where(b1o == 0, 0, end0),
            jnp.where(c1 == 0, x_next - 1,
                      PAIR + (Km1 - 1) * Km1 + (j1 - 1)))
        jp = x_next - PAIR
        a, b = jp // Km1, jp % Km1
        from_p = jnp.where(
            (a == 0) & (b == 0), 0,
            jnp.where(b == 0, SGL0 + a - 1,
                      jnp.where(a == 0, SGL1 + b - 1, x_next - Km1 - 1)))
        x_prev = jnp.where(
            x_next == 0, from_sil,
            jnp.where(x_next < SGL1, from_s0,
                      jnp.where(x_next < PAIR, from_s1, from_p)))
        return x_prev.astype(jnp.int32), x_prev.astype(jnp.int32)

    _, xs = jax.lax.scan(back, xT, jnp.arange(W - 1, 0, -1))
    xs = xs[::-1]
    return jnp.concatenate([xs.T, xT[:, None]], axis=1)
