"""Pallas TPU kernel: fused emission + max-plus Viterbi forward (N=2
pairwise-overlap ring space).

One program per overlap-save block. The entire W-step forward recursion
runs inside the kernel with all state resident in VMEM/SMEM:

  vs   scalar          all-silent score              (SMEM scratch)
  v0   (1, LK)         single-active neuron 0        (VMEM; lanes >= K-1
  v1   (1, LK)         single-active neuron 1         masked to ~-inf)
  vp   (SK, LK)        pair grid (k1 on sublanes, k2 on lanes)

Per step: Gaussian emissions computed in-register from the block's y
sample, ring shifts via pltpu.roll with edge fixups, and backpointer
choice flags written straight to the output refs. Fusing the step removes
the per-step HBM round trips an XLA scan pays for its carries — only y
(in) and the choice flags (out) touch HBM.

The backtrace (inherently sequential pointer chasing) stays in XLA over
the flag outputs, identical to ops/ring_viterbi.ring_viterbi_ov2, whose
decode this kernel path matches bit-for-bit (tested via interpret mode on
CPU and verified on v5e hardware).

Measured status (v5e, K=60, 256 x 8704-sample windows): the kernel is
correct but ~10x slower than the XLA ring scan (2.1M vs 20M samples/s
forward) — Pallas grid programs execute *serially* on a core, so putting
the block axis on the grid forfeits the lane-level block parallelism the
vmapped XLA scan gets for free, and the masked (1, W) flag-row accumulate
adds O(W) work per step. The production decode path therefore remains
ops/ring_viterbi under parallel/overlap_save.ring_overlap_save; this
kernel is kept as the fused-step reference implementation (a faster
variant needs multiple blocks per program in the vector dims).

Reference semantics preserved: emission-only init (+ forced silent start
on request), strict-first-max tie-break in in-edge source order
(src/viterbi.jl:56-84).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALF_LOG_2PI = 0.9189385332046727
NEG = -3.0e38


def _round_up(x, m):
    return -(-x // m) * m


def _make_kernel(Km1: int, LK: int, SK: int, W: int):
    def kernel(y_ref, consts_ref, b0m_ref, b1m_ref, pm_ref, sil_ref,
               flags_ref, rings_ref,
               vsT_ref, v0T_ref, v1T_ref, vpT_ref):
        lp0 = consts_ref[0, 0]
        lp1 = consts_ref[0, 1]
        lpz = consts_ref[0, 2]
        log_sigma = consts_ref[0, 3]
        inv_2s2 = consts_ref[0, 4]
        silent_mean = consts_ref[0, 5]
        silent_start = sil_ref[0, 0, 0]

        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LK), 1)
        sub2 = jax.lax.broadcasted_iota(jnp.int32, (SK, LK), 0)
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (SK, LK), 1)
        mask1 = lane1 < Km1
        maskp = (sub2 < Km1) & (lane2 < Km1)

        def em_all(y_t):
            es = -HALF_LOG_2PI - log_sigma - (y_t - silent_mean) ** 2 * inv_2s2
            d0 = y_t - b0m_ref[:]
            d1 = y_t - b1m_ref[:]
            dp = y_t - pm_ref[:]
            return (es,
                    -HALF_LOG_2PI - log_sigma - d0 * d0 * inv_2s2,
                    -HALF_LOG_2PI - log_sigma - d1 * d1 * inv_2s2,
                    -HALF_LOG_2PI - log_sigma - dp * dp * inv_2s2)

        lane_w = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)

        def body(vs_s, v0s, v1s, vps, flags_s, ring_stage):
            y0 = y_ref[0, 0, 0]
            es, e0, e1, ep = em_all(y0)
            vs_s[0, 0] = jnp.where(silent_start > 0,
                                   jnp.float32(0.0), es)
            v0s[:] = jnp.where(mask1, e0, NEG)
            v1s[:] = jnp.where(mask1, e1, NEG)
            vps[:] = jnp.where(maskp, ep, NEG)

            def step(t, s_static):
                vs = vs_s[0, 0]
                v0 = v0s[:]
                v1 = v1s[:]
                vp = vps[:]
                y_t = y_ref[0, 0, t]
                es, e0, e1, ep = em_all(y_t)

                end0 = jnp.max(jnp.where(lane1 == Km1 - 1, v0, NEG))
                end1 = jnp.max(jnp.where(lane1 == Km1 - 1, v1, NEG))
                pair_end = jnp.max(jnp.where(
                    (sub2 == Km1 - 1) & (lane2 == Km1 - 1), vp, NEG))
                # pair last column (per k1, over lanes) -> (SK, 1);
                # pair last row (per k2, over sublanes) -> (1, LK)
                vp_lastcol = jnp.max(jnp.where(lane2 == Km1 - 1, vp, NEG),
                                     axis=1, keepdims=True)      # (SK, 1)
                vp_lastrow = jnp.max(jnp.where(sub2 == Km1 - 1, vp, NEG),
                                     axis=0, keepdims=True)      # (1, LK)

                # ---- silent target; first-max over source-ordered
                # candidates [self, end0, end1, pair_end]
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

                # ---- single onsets (slot 0)
                on0a = vs + lp0 + lpz
                on0b = end1 + lp0
                on1a = vs + lp1 + lpz
                on1b = end0 + lp1
                b0_on = (on0b > on0a).astype(jnp.int32)
                b1_on = (on1b > on1a).astype(jnp.int32)
                on0 = jnp.maximum(on0a, on0b)
                on1 = jnp.maximum(on1a, on1b)

                # ---- single ring slots k>=1: same-ring shift vs pair
                # handoff (other neuron exits). Lane k holds slot k.
                v0_sh = pltpu.roll(v0, 1, axis=1) + lpz
                v1_sh = pltpu.roll(v1, 1, axis=1) + lpz
                # pair(k-1, K-1) indexed by lane k: transpose the lastcol
                # sublane vector onto lanes, pad, shift right
                colT = jnp.transpose(vp_lastcol)                  # (1, SK)
                colT = jnp.pad(colT, ((0, 0), (0, LK - SK)),
                               constant_values=NEG)
                hand0 = pltpu.roll(colT, 1, axis=1)
                hand1 = pltpu.roll(vp_lastrow, 1, axis=1)
                r0 = jnp.maximum(v0_sh, hand0)
                r1 = jnp.maximum(v1_sh, hand1)
                b0_ring = (hand0 > v0_sh).astype(jnp.int32)
                b1_ring = (hand1 > v1_sh).astype(jnp.int32)
                new_v0 = jnp.where(lane1 == 0, on0, r0)
                new_v1 = jnp.where(lane1 == 0, on1, r1)
                new_v0 = jnp.where(mask1, new_v0 + e0, NEG)
                new_v1 = jnp.where(mask1, new_v1 + e1, NEG)

                # ---- pair grid: diagonal shift; row k1=1 from v1+onset0;
                # column k2=1 from v0+onset1 (transposed onto sublanes)
                vp_diag = pltpu.roll(pltpu.roll(vp, 1, axis=0), 1, axis=1)
                top = pltpu.roll(v1, 1, axis=1) + lp0             # (1, LK)
                top = jnp.where(lane1 == 0, vs + lp0 + lp1, top)
                left_lane = pltpu.roll(v0, 1, axis=1) + lp1       # (1, LK)
                leftT = jnp.transpose(left_lane)                  # (LK, 1)
                leftT = leftT[:SK]                                # (SK, 1)
                new_vp = jnp.where(sub2 == 0, top,
                                   jnp.where(lane2 == 0, leftT, vp_diag))
                new_vp = jnp.where(maskp, new_vp + ep, NEG)

                vs_s[0, 0] = new_vs
                v0s[:] = new_v0
                v1s[:] = new_v1
                vps[:] = new_vp

                # scalar flags: masked vector accumulate into a VMEM row
                # (scalar stores to VMEM are unsupported)
                packed = bp_sil + 4 * (b0_on + 2 * b1_on)
                flags_s[:] = jnp.where(lane_w == t, packed, flags_s[:])
                # ring flags staged at a *static* sublane (i8 tiling forbids
                # unaligned dynamic row stores), flushed 32 rows at a time
                ring_stage[s_static, :] = (b0_ring + 2 * b1_ring)[0].astype(jnp.int8)
                return 0

            # chunked loop: 32 static inner steps -> aligned stage flush
            CH = 32
            assert W % CH == 0

            def chunk(c, _):
                for s in range(CH):
                    t = c * CH + s
                    if s == 0:
                        @pl.when(t > 0)
                        def _():
                            step(t, s)
                    else:
                        step(t, s)
                rings_ref[0, pl.ds(c * CH, CH), :] = ring_stage[:]
                return 0

            jax.lax.fori_loop(0, W // CH, chunk, 0)
            flags_ref[0] = flags_s[:]
            vsT_ref[0, 0, 0] = vs_s[0, 0]
            v0T_ref[0] = v0s[:]
            v1T_ref[0] = v1s[:]
            vpT_ref[0] = vps[:]

        pl.run_scoped(
            body,
            vs_s=pltpu.SMEM((1, 1), jnp.float32),
            v0s=pltpu.VMEM((1, LK), jnp.float32),
            v1s=pltpu.VMEM((1, LK), jnp.float32),
            vps=pltpu.VMEM((SK, LK), jnp.float32),
            flags_s=pltpu.VMEM((1, W), jnp.int32),
            ring_stage=pltpu.VMEM((32, LK), jnp.int8),
        )

    return kernel


@partial(jax.jit, static_argnames=("silent_start0", "interpret"))
def ov2_forward_pallas(y_win, lp, mu, sigma, *, silent_start0=True,
                       interpret=False):
    """Fused forward over (B, W) windows.

    Returns (bpsil (B,W) i32, bpon (B,W) i32, b0r/b1r (B,W,LK) i8,
    vsT (B,1), v0T/v1T (B,LK), vpT (B,SK,LK)); flag position t=0 is unused.
    """
    B, W = y_win.shape
    K = mu.shape[0]
    Km1 = K - 1
    LK = _round_up(Km1, 128)
    SK = _round_up(max(Km1, 8), 8)
    dtype = jnp.float32

    lp = jnp.asarray(lp, dtype)
    mu = jnp.asarray(mu, dtype)
    sigma = jnp.asarray(sigma, dtype)
    lpz = jnp.log1p(-jnp.exp(jnp.sum(lp)))
    consts = jnp.stack([lp[0], lp[1], lpz, jnp.log(sigma),
                        1.0 / (2.0 * sigma * sigma),
                        mu[0, 0] + mu[0, 1]])[None, :]
    b0m = jnp.zeros((1, LK), dtype).at[0, :Km1].set(mu[1:, 0] + mu[0, 1])
    b1m = jnp.zeros((1, LK), dtype).at[0, :Km1].set(mu[1:, 1] + mu[0, 0])
    pm = jnp.zeros((SK, LK), dtype).at[:Km1, :Km1].set(
        mu[1:, 0][:, None] + mu[1:, 1][None, :])
    sil = jnp.zeros((B, 1, 1), jnp.int32)
    if silent_start0:
        sil = sil.at[0, 0, 0].set(1)

    kernel = _make_kernel(Km1, LK, SK, W)
    grid_spec = pl.GridSpec(
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 6), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, LK), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LK), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SK, LK), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, LK), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, LK), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, LK), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SK, LK), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((B, 1, W), jnp.int32),
        jax.ShapeDtypeStruct((B, W, LK), jnp.int8),
        jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, 1, LK), jnp.float32),
        jax.ShapeDtypeStruct((B, 1, LK), jnp.float32),
        jax.ShapeDtypeStruct((B, SK, LK), jnp.float32),
    ]
    outs = pl.pallas_call(kernel, out_shape=out_shape, grid_spec=grid_spec,
                          interpret=interpret)(
        y_win.astype(dtype)[:, None, :], consts, b0m, b1m, pm, sil)
    flags, rings, vsT, v0T, v1T, vpT = outs
    flags = flags[:, 0]
    bpsil = flags & 3
    bpon = flags >> 2
    b0r = (rings & 1).astype(jnp.int8)
    b1r = (rings >> 1).astype(jnp.int8)
    return (bpsil, bpon, b0r, b1r, vsT[:, 0], v0T[:, 0], v1T[:, 0], vpT)


def ov2_decode_from_kernel(outs, Km1: int, W: int):
    """XLA backtrace over the kernel's flag outputs -> (B, W) labels.

    Same chase as ring_viterbi_ov2.back, driven by the packed flags."""
    bpsil, bpon, b0r, b1r, vsT, v0T, v1T, vpT = outs
    B = bpsil.shape[0]
    LK = v0T.shape[1]
    SK = vpT.shape[1]
    SGL0, SGL1, PAIR = 1, 1 + Km1, 1 + 2 * Km1
    S = 1 + 2 * Km1 + Km1 * Km1

    # final state: argmax over the flat (padded) state vector
    flat = jnp.concatenate(
        [vsT, v0T[:, :Km1], v1T[:, :Km1],
         vpT[:, :Km1, :Km1].reshape(B, -1)], axis=1)     # (B, S)
    xT = jnp.argmax(flat, axis=1).astype(jnp.int32)

    ring_iota = jnp.arange(LK, dtype=jnp.int32)

    def back(x_next, t):
        bp_s = bpsil[:, t]
        b0o = bpon[:, t] & 1
        b1o = bpon[:, t] >> 1
        end0, end1 = SGL0 + Km1 - 1, SGL1 + Km1 - 1
        pair_end = PAIR + (Km1 - 1) * Km1 + (Km1 - 1)

        from_sil = jnp.where(
            bp_s == 0, 0,
            jnp.where(bp_s == 1, end0, jnp.where(bp_s == 2, end1, pair_end)))
        j0 = x_next - SGL0
        c0 = jnp.sum(jnp.where(ring_iota[None, :] == j0[:, None],
                               b0r[:, t].astype(jnp.int32), 0), axis=1)
        from_s0 = jnp.where(
            j0 == 0, jnp.where(b0o == 0, 0, end1),
            jnp.where(c0 == 0, x_next - 1,
                      PAIR + (j0 - 1) * Km1 + (Km1 - 1)))
        j1 = x_next - SGL1
        c1 = jnp.sum(jnp.where(ring_iota[None, :] == j1[:, None],
                               b1r[:, t].astype(jnp.int32), 0), axis=1)
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
    xs = xs[::-1]                                         # (W-1, B)
    return jnp.concatenate([xs.T, xT[:, None]], axis=1)   # (B, W)


def ov2_decode_pallas(y_win, lp, mu, sigma, *, silent_start0=True,
                      interpret=False):
    """(B, W) windows -> (B, W) labels via the fused kernel + XLA backtrace."""
    K = jnp.asarray(mu).shape[0]
    outs = ov2_forward_pallas(y_win, lp, mu, sigma,
                              silent_start0=silent_start0,
                              interpret=interpret)
    return ov2_decode_from_kernel(outs, K - 1, y_win.shape[1])
