"""Pallas TPU kernel, multi-block layout: fused emission + max-plus Viterbi
forward + lane-parallel backtrace for the **general-N** pairwise-overlap ring
space (the production CLI topology, src/hmmsort.jl:57 — up to 4 templates
with overlaps on), G overlap-save blocks per program on the VPU lane axis.

Generalizes ops/pallas_viterbi_mb.py (the N=2 kernel) to any N >= 2 with the
reference's at-most-two-active overlap model (src/types.jl:65-92): state
blocks are [silent | N single rings (K-1) | C(N,2) pair grids (K-1)^2,
pairs i-major] — identical flat indexing to core/state_space.py and
ops/ring_viterbi_ovn.py.

Layout per program (KP = K-1 rounded up to 8, G = 128 lanes = blocks):

    vs   (8, G)           all-silent score, row 0 live      (VMEM scratch)
    vb   (N*KP, G)        single rings, neuron-major sublane groups
    vp   (P*KP, KP, G)    pair grids, (pair-major segment k1, sublane k2,
                          lane block); P = N(N-1)/2

Every structural read the general-N recursion needs is a static slice, a
sublane roll, or a masked sublane reduction — no gathers:

  * ring ends / pair last rows / pair ends: static row slices;
  * pair last columns (indexed by k1): one masked max over the k2 sublanes;
  * ring shifts, onset handoffs, and the cross-pair "third member exits"
    handoffs (N >= 3): pltpu.roll along sublanes of (KP, G) vectors;
  * the pair diagonal shift vp[k1,k2] <- vp[k1-1,k2-1]: one roll by KP+1 on
    the (KP*KP, G) flattened grid (wrapped rows land exactly on the k1=0 row
    and k2=0 column overwritten by the onset injections).

The termination argmax (first max over the flat state order, viterbi.jl:90)
runs INSIDE the forward kernel at the last chunk, so the (S,)-sized final
state planes never leave VMEM — only per-step decision flags stream to HBM:

    flags  (W*(1+N+P), G) i32   [silent | N onset | P corner] choices
    rings  (W*N*KP, G)   i8     per-neuron ring-slot choice (0 = same ring,
                                c >= 1 = pair qn[n][c-1] hands back)
    rowcol (W*2P*KP, G)  i8     pair edge-row/column choices (0 = single
                                advances, c >= 1 = third-member pair)

The backtrace kernel mirrors ops/pallas_viterbi_mb's: grid chunks iterated
in reverse via the index maps, each lane chasing its own pointer chain; flag
lookups at dynamic ring slots are one-hot sublane reductions.

Candidate ordering, float association, and tie-breaking (strict first-max)
mirror ops/ring_viterbi_ovn.py expression by expression, so labels bit-match
that engine (and through it the gather engine and the reference semantics,
src/viterbi.jl:56-96) in the same dtype. Tested in interpret mode for
N = 2, 3, 4; validated on hardware by scripts/tpu_parity.py.

VMEM: the dominant term is the P pair grids (P * KP^2 * G * 4 bytes —
6.3 MB for N=3, K=60; 12.6 MB for N=4). The forward kernels request a
raised scoped-VMEM ceiling (`vmem_limit_bytes=VMEM_LIMIT` — the Mosaic
default is 16 MB but v5e cores have more physical VMEM), which admits
both the N=4 single-channel config and the MC front-end's larger live
set; `ovn_mb_vmem_ok`/`ovn_mc_mb_vmem_ok` gate auto-selection with a
measured actual/estimate slop factor.

The dynamics are emission-agnostic (`_make_fwd_kernel` takes an emission
factory); two front-ends share them verbatim:

  * `ovn_decode_pallas_mb` — single-channel, fused (y - mean)^2 emission
    computed from the raw signal window in-kernel;
  * `ovn_mc_decode_pallas_mb` — multi-channel, consuming the factorized
    stream windows of core/emission_mc.mc_streams (es + per-neuron d
    slabs; eb = (es + d) - c1, ep = ((es + d_i) + d_j) - c2), so labels
    bit-match ops/ring_viterbi_mc._ovn_mc_scan. The backtrace kernel is
    shared unchanged (it reads only decision flags).
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
G = 128          # blocks per program == VPU lanes
CH = 16          # window steps per grid chunk

# Scoped-VMEM ceiling requested from Mosaic for the forward kernels. The
# default scoped limit is 16 MB; v5e cores have more physical VMEM, and the
# MC front-end's live temporaries measured 18 MB at the production config
# (N=3, K=60) — raising the cap is how Mosaic sanctions that. The request
# does not reserve memory; it only widens the compile-time stack check.
# VMEM_LIMIT is the validated v5e value used at kernel-build time; the
# auto-selection gates consult the per-device-kind ceiling
# (utils/platform.tpu_vmem_ceiling_bytes) so cores with ~16 MB physical
# VMEM keep falling back to the XLA engines.
VMEM_LIMIT = 64 * 2**20


def _gate_ceiling() -> int:
    from ..utils.platform import tpu_vmem_ceiling_bytes

    return min(VMEM_LIMIT, tpu_vmem_ceiling_bytes())


# Measured actual/estimated scoped-usage ratios: Mosaic keeps more grid
# temporaries live than the two the estimators count. Single-channel: the
# N=3 K=60 kernel compiled under the 16 MB default against a 12.1 MB
# estimate (ratio <= 1.32). MC: 18.0 MB actual vs 12.9 MB estimated
# (ratio 1.4). Gates scale estimates by these before comparing against
# the ceiling.
VMEM_SLOP = 1.3          # single-channel kernel
VMEM_SLOP_MC = 1.5       # MC front-end (larger live emission set)


def _round_up(x, m):
    return -(-x // m) * m


def _kp(K):
    return max(8, _round_up(K - 1, 8))


def _tables(N):
    """Static structure tables (mirroring ring_viterbi_ovn's candidate
    enumeration order exactly — first-max parity depends on it)."""
    pairs = [(i, j) for i in range(N - 1) for j in range(i + 1, N)]
    pair_idx = {p: q for q, p in enumerate(pairs)}
    # pairs containing n, ascending q; flag records whether n is the i-slot
    qn = [[(q, i == n) for q, (i, j) in enumerate(pairs) if n in (i, j)]
          for n in range(N)]
    # third-member maps for pair (i,j): advancing member adv was in source
    # pair (adv, m) with m at ring end; others m enumerated ascending
    row_tab = [[(pair_idx[(min(j, m), max(j, m))], j == min(j, m))
                for m in range(N) if m not in (i, j)] for (i, j) in pairs]
    col_tab = [[(pair_idx[(min(i, m), max(i, m))], i == min(i, m))
                for m in range(N) if m not in (i, j)] for (i, j) in pairs]
    return pairs, qn, row_tab, col_tab


def ovn_mb_vmem_bytes(N: int, K: int) -> int:
    """Rough per-program VMEM footprint: state scratch + two live grid
    temporaries + streamed in/out blocks."""
    P = N * (N - 1) // 2
    KP = _kp(K)
    grid = KP * KP * G * 4
    out = (CH * (1 + N + P) * G * 4 + CH * N * KP * G
           + CH * 2 * P * KP * G)
    return (P + 2) * grid + N * KP * G * 4 + out + 3 * N * KP * G * 4


def ovn_mb_vmem_ok(N: int, K: int, ceiling: int | None = None) -> bool:
    if ceiling is None:
        ceiling = _gate_ceiling()
    return ovn_mb_vmem_bytes(N, K) * VMEM_SLOP <= ceiling


def _first_max(cands):
    """Strict first-max chain over ordered (flag, value) candidates —
    identical winner/flag to jnp.argmax over the stacked candidate axis."""
    k0, v0 = cands[0]
    best = v0
    flag = jnp.full(v0.shape, k0, jnp.int32)
    for k, v in cands[1:]:
        take = v > best
        flag = jnp.where(take, k, flag)
        best = jnp.maximum(best, v)
    return best, flag


def _make_fwd_kernel(N, Km1, KP, Wc, pairs, qn, row_tab, col_tab,
                     em_factory, n_em, ch):
    """General-N forward kernel with a pluggable emission provider.

    em_factory(em_refs) -> (lpz, lp list, em_all) where
    em_all(s) -> (es (1, G), eb (N*KP, G), ep_fn(q) -> (KP, KP, G)) reads
    the per-step emission values from the first `n_em` kernel refs. The
    max-plus dynamics below are emission-agnostic — the single-channel and
    multi-channel front-ends share them verbatim (the same pattern as
    ring_viterbi_ovn._ovn_core's em callback).
    """
    P = len(pairs)
    F = 1 + N + P
    NR = N * KP
    RC = 2 * P * KP

    def kernel(*args):
        em_refs = args[:n_em]
        (sil_ref, flags_ref, rings_ref, rowcol_ref, xT_ref,
         vs_s, vb_s, vp_s) = args[n_em:]
        c = pl.program_id(1)
        lpz, lp, em_all = em_factory(em_refs)

        sub2 = jax.lax.broadcasted_iota(jnp.int32, (KP, G), 0)
        seg3 = jax.lax.broadcasted_iota(jnp.int32, (KP, KP, G), 0)
        sub3 = jax.lax.broadcasted_iota(jnp.int32, (KP, KP, G), 1)
        mask1 = sub2 < Km1
        maskp = (seg3 < Km1) & (sub3 < Km1)

        @pl.when(c == 0)
        def _init():
            es0, eb, ep0 = em_all(0)
            sil = sil_ref[0, 0:1, :]
            vs_s[0:1, :] = jnp.where(sil > 0, jnp.float32(0.0), es0)
            for n in range(N):
                vb_s[n * KP:(n + 1) * KP, :] = jnp.where(
                    mask1, eb[n * KP:(n + 1) * KP, :], NEG)
            for q in range(P):
                vp_s[q * KP:(q + 1) * KP] = jnp.where(
                    maskp, ep0(q), NEG)

        for s in range(ch):
            def step(s=s):
                es, eb_all, ep_fn = em_all(s)
                vs = vs_s[0:1, :]
                ends = [vb_s[n * KP + Km1 - 1: n * KP + Km1, :]
                        for n in range(N)]                     # (1, G)
                lastcol, lastrow = [], []
                for q in range(P):
                    gq = vp_s[q * KP:(q + 1) * KP]             # (KP, KP, G)
                    lastcol.append(jnp.max(
                        jnp.where(sub3 == Km1 - 1, gq, NEG), axis=1))
                    lastrow.append(gq[Km1 - 1])                # (KP, G) by k2
                p_end = [lastrow[q][Km1 - 1:Km1, :] for q in range(P)]

                # ---- silent: [self | singles asc | pairs asc]
                cands = [(0, vs + N * lpz)]
                cands += [(1 + n, ends[n] + (N - 1) * lpz)
                          for n in range(N)]
                cands += [(1 + N + q, p_end[q] + (N - 2) * lpz)
                          for q in range(P)]
                sil_best, bp_sil = _first_max(cands)
                new_vs = sil_best + es

                # ---- single onset slots (flags over the shared
                # [silent | singles | pairs] index space; invalid slots
                # skipped — they are -inf-masked in the XLA engine and can
                # never win there either)
                new_on = []
                for n in range(N):
                    cs = [(0, vs + lp[n] + (N - 1) * lpz)]
                    for m in range(N):
                        if m != n:
                            cs.append((1 + m,
                                       ends[m] + lp[n] + (N - 2) * lpz))
                    for q in range(P):
                        if n not in pairs[q]:
                            cs.append((1 + N + q,
                                       p_end[q] + lp[n] + (N - 3) * lpz))
                    new_on.append(_first_max(cs))

                # ---- single ring slots k >= 1: same ring vs pair handback
                new_vb_list, ring_flags = [], []
                for n in range(N):
                    vbn = vb_s[n * KP:(n + 1) * KP, :]
                    cs = [(0, pltpu.roll(vbn, 1, axis=0) + (N - 1) * lpz)]
                    for cidx, (q, n_is_i) in enumerate(qn[n], start=1):
                        src = lastcol[q] if n_is_i else lastrow[q]
                        cs.append((cidx, pltpu.roll(src, 1, axis=0)
                                   + (N - 2) * lpz))
                    rb, rf = _first_max(cs)
                    nv = jnp.where(sub2 == 0, new_on[n][0], rb)
                    nv = jnp.where(mask1,
                                   nv + eb_all[n * KP:(n + 1) * KP, :], NEG)
                    new_vb_list.append(nv)
                    ring_flags.append(rf)

                # ---- pair edge rows/columns + corners (old vb still live)
                tops, lefts = [], []
                corner_flags, prow_flags, pcol_flags = [], [], []
                for q, (i, j) in enumerate(pairs):
                    lpij = lp[i] + lp[j]
                    cs = [(0, vs + lpij + (N - 2) * lpz)]
                    for m in range(N):
                        if m not in (i, j):
                            cs.append((1 + m,
                                       ends[m] + lpij + (N - 3) * lpz))
                    for r, pr in enumerate(pairs):
                        if not (set(pr) & {i, j}):
                            cs.append((1 + N + r,
                                       p_end[r] + lpij + (N - 4) * lpz))
                    cb, cf = _first_max(cs)
                    corner_flags.append(cf)

                    vbj = vb_s[j * KP:(j + 1) * KP, :]
                    cs = [(0, pltpu.roll(vbj, 1, axis=0)
                           + lp[i] + (N - 2) * lpz)]
                    for cidx, (r, adv_is_i) in enumerate(row_tab[q],
                                                         start=1):
                        src = lastcol[r] if adv_is_i else lastrow[r]
                        cs.append((cidx, pltpu.roll(src, 1, axis=0)
                                   + lp[i] + (N - 3) * lpz))
                    tb, tf = _first_max(cs)
                    tops.append(jnp.where(sub2 == 0, cb, tb))
                    prow_flags.append(tf)

                    vbi = vb_s[i * KP:(i + 1) * KP, :]
                    cs = [(0, pltpu.roll(vbi, 1, axis=0)
                           + lp[j] + (N - 2) * lpz)]
                    for cidx, (r, adv_is_i) in enumerate(col_tab[q],
                                                         start=1):
                        src = lastcol[r] if adv_is_i else lastrow[r]
                        cs.append((cidx, pltpu.roll(src, 1, axis=0)
                                   + lp[j] + (N - 3) * lpz))
                    lb, lf = _first_max(cs)
                    lefts.append(lb)
                    pcol_flags.append(lf)

                # ---- commit state
                vs_s[0:1, :] = new_vs
                for n in range(N):
                    vb_s[n * KP:(n + 1) * KP, :] = new_vb_list[n]
                for q in range(P):
                    gq = vp_s[q * KP:(q + 1) * KP]
                    flat = gq.reshape(KP * KP, G)
                    rolled = pltpu.roll(flat, KP + 1, axis=0).reshape(
                        KP, KP, G)
                    nv = jnp.where(
                        seg3 == 0, tops[q][None, :, :],
                        jnp.where(sub3 == 0, lefts[q][:, None, :],
                                  rolled + (N - 2) * lpz))
                    # two-stage commit: write the structural update, then
                    # add the emission read-modify-write — the per-element
                    # arithmetic is identical to `nv + ep`, but the nv and
                    # ep temporary chains are never live together (the
                    # (KP, KP, G) grids dominate scoped VMEM)
                    vp_s[q * KP:(q + 1) * KP] = nv
                    vp_s[q * KP:(q + 1) * KP] = jnp.where(
                        maskp, vp_s[q * KP:(q + 1) * KP] + ep_fn(q), NEG)

                # ---- flag streams (static offsets; i8 narrowed at store —
                # Mosaic has no i8 arithmetic)
                flags_ref[0, s * F: s * F + 1, :] = bp_sil
                for n in range(N):
                    flags_ref[0, s * F + 1 + n: s * F + 2 + n, :] = \
                        new_on[n][1]
                for q in range(P):
                    flags_ref[0, s * F + 1 + N + q: s * F + 2 + N + q, :] \
                        = corner_flags[q]
                for n in range(N):
                    rings_ref[0, s * NR + n * KP: s * NR + (n + 1) * KP,
                              :] = ring_flags[n].astype(jnp.int8)
                for q in range(P):
                    rowcol_ref[0, s * RC + q * KP: s * RC + (q + 1) * KP,
                               :] = prow_flags[q].astype(jnp.int8)
                    rowcol_ref[0, s * RC + (P + q) * KP:
                               s * RC + (P + q + 1) * KP, :] = \
                        pcol_flags[q].astype(jnp.int8)

            if s == 0:
                @pl.when((c > 0) | (s > 0))
                def _():
                    step()
                # chunk 0, step 0 is the init sample: flag slots unused,
                # but the output blocks must still be written
                @pl.when(c == 0)
                def _():
                    flags_ref[0, 0:F, :] = jnp.zeros((F, G), jnp.int32)
                    rings_ref[0, 0:NR, :] = jnp.zeros((NR, G), jnp.int8)
                    rowcol_ref[0, 0:RC, :] = jnp.zeros((RC, G), jnp.int8)
            else:
                step()

        @pl.when(c == Wc - 1)
        def _final():
            # first-argmax over the flat state order (viterbi.jl:90) — the
            # big final planes never leave VMEM, only the winning index
            BIG = jnp.int32(1 << 30)
            best = vs_s[0:1, :]
            idx = jnp.zeros((1, G), jnp.int32)
            for n in range(N):
                pv = jnp.where(mask1, vb_s[n * KP:(n + 1) * KP, :], NEG)
                mx = jnp.max(pv, axis=0, keepdims=True)
                pi = jnp.where(mask1 & (pv == mx), sub2, BIG)
                mi = jnp.min(pi, axis=0, keepdims=True)
                take = mx > best
                idx = jnp.where(take, 1 + n * Km1 + mi, idx)
                best = jnp.maximum(best, mx)
            for q in range(P):
                gv = jnp.where(maskp, vp_s[q * KP:(q + 1) * KP], NEG)
                mx = jnp.max(jnp.max(gv, axis=1), axis=0, keepdims=True)
                fi = jnp.where(maskp & (gv == mx[None, :, :]),
                               seg3 * Km1 + sub3, BIG)
                mi = jnp.min(jnp.min(fi, axis=1), axis=0, keepdims=True)
                take = mx > best
                idx = jnp.where(take,
                                1 + N * Km1 + q * Km1 * Km1 + mi, idx)
                best = jnp.maximum(best, mx)
            xT_ref[0] = idx

    return kernel


@partial(jax.jit, static_argnames=("silent_start0", "interpret"))
def _forward_native(y_win, lp, mu, sigma, *, silent_start0=True,
                    silent_mask=None, interpret=False):
    """Fused general-N multi-block forward; outputs stay in the kernel's
    native (Bg, ..., G) lane layout: flags (Bg, W*F, G) i32, rings
    (Bg, W*N*KP, G) i8, rowcol (Bg, W*2P*KP, G) i8, xT (Bg, 1, G) i32."""
    B, W = y_win.shape
    K, N = mu.shape
    Km1 = K - 1
    KP = _kp(K)
    if N < 2:
        raise ValueError("general-N overlap kernel needs N >= 2")
    if W % CH != 0:
        raise ValueError(f"W={W} must be a multiple of CH={CH}")
    Wc = W // CH
    Bg = _round_up(B, G) // G
    Bp = Bg * G
    dtype = jnp.float32
    pairs, qn, row_tab, col_tab = _tables(N)
    P = len(pairs)
    F = 1 + N + P

    lp = jnp.asarray(lp, dtype)
    mu = jnp.asarray(mu, dtype)
    sigma = jnp.asarray(sigma, dtype)
    lpz = jnp.log1p(-jnp.exp(jnp.sum(lp)))
    mu0_sum = jnp.sum(mu[0])
    consts = jnp.concatenate([
        jnp.stack([lpz, jnp.log(sigma), 1.0 / (2.0 * sigma * sigma),
                   mu0_sum]),
        lp,
        jnp.stack([(mu0_sum - mu[0, i]) - mu[0, j] for (i, j) in pairs]),
    ])[None, :]
    # single-active means (ring_viterbi_ovn association: mu + (sum - own0))
    bm = jnp.zeros((N * KP, 1), dtype)
    am = jnp.zeros((N * KP, 1), dtype)
    for n in range(N):
        bm = bm.at[n * KP:n * KP + Km1, 0].set(
            mu[1:, n] + (mu0_sum - mu[0, n]))
        am = am.at[n * KP:n * KP + Km1, 0].set(mu[1:, n])
    bm = jnp.broadcast_to(bm, (N * KP, G))
    am = jnp.broadcast_to(am, (N * KP, G))

    ypad = jnp.zeros((Bp, W), dtype).at[:B].set(y_win.astype(dtype))
    y_in = ypad.reshape(Bg, G, W).transpose(0, 2, 1)          # (Bg, W, G)
    sil = jnp.zeros((Bp,), jnp.int32)
    if silent_mask is not None:
        sil = sil.at[:B].set(jnp.asarray(silent_mask).astype(jnp.int32))
    elif silent_start0:
        sil = sil.at[0].set(1)
    sil_in = sil.reshape(Bg, G)[:, None, :]                   # (Bg, 1, G)

    def em_factory(em_refs):
        """Single-channel fused emission: (y - mean)^2 from the raw signal
        window, means pre-broadcast over lanes."""
        y_ref, consts_ref, bm_ref, am_ref = em_refs
        lpz = consts_ref[0, 0]
        log_sigma = consts_ref[0, 1]
        inv_2s2 = consts_ref[0, 2]
        silent_mean = consts_ref[0, 3]
        lp = [consts_ref[0, 4 + n] for n in range(N)]
        cq = [consts_ref[0, 4 + N + q] for q in range(P)]
        econst = -HALF_LOG_2PI - log_sigma

        def em_all(s):
            y_t = y_ref[0, s:s + 1, :]
            ds = y_t - silent_mean
            es = econst - ds * ds * inv_2s2                   # (1, G)
            db = y_t - bm_ref[...]
            eb = econst - db * db * inv_2s2                   # (NR, G)

            def ep_fn(q):
                # mean association mirrors ring_viterbi_ovn:
                # (a_i + a_j) + c_q
                i, j = pairs[q]
                ai = am_ref[i * KP:(i + 1) * KP, :]
                aj = am_ref[j * KP:(j + 1) * KP, :]
                m = (ai[:, None, :] + aj[None, :, :]) + cq[q]
                dp = y_t[None, :, :] - m
                return econst - dp * dp * inv_2s2             # (KP, KP, G)

            return es, eb, ep_fn

        return lpz, lp, em_all

    NR = N * KP
    kernel = _make_fwd_kernel(N, Km1, KP, Wc, pairs, qn, row_tab, col_tab,
                              em_factory, 4, CH)
    grid = (Bg, Wc)
    in_specs = [
        pl.BlockSpec((1, CH, G), lambda b, c: (b, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 4 + N + P), lambda b, c: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((N * KP, G), lambda b, c: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((N * KP, G), lambda b, c: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, G), lambda b, c: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, CH * F, G), lambda b, c: (b, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CH * N * KP, G), lambda b, c: (b, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CH * 2 * P * KP, G), lambda b, c: (b, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, G), lambda b, c: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((Bg, W * F, G), jnp.int32),
        jax.ShapeDtypeStruct((Bg, W * N * KP, G), jnp.int8),
        jax.ShapeDtypeStruct((Bg, W * 2 * P * KP, G), jnp.int8),
        jax.ShapeDtypeStruct((Bg, 1, G), jnp.int32),
    ]
    scratch = [
        pltpu.VMEM((8, G), jnp.float32),
        pltpu.VMEM((N * KP, G), jnp.float32),
        pltpu.VMEM((P * KP, KP, G), jnp.float32),
    ]
    return pl.pallas_call(
        kernel, out_shape=out_shape, grid=grid, in_specs=in_specs,
        out_specs=out_specs, scratch_shapes=scratch, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
    )(y_in, consts, bm, am, sil_in)


def _make_bt_kernel(N, Km1, KP, Wc, pairs, qn, row_tab, col_tab):
    P = len(pairs)
    F = 1 + N + P
    NR = N * KP
    RC = 2 * P * KP
    SGL = [1 + n * Km1 for n in range(N)]
    PAIR = [1 + N * Km1 + q * Km1 * Km1 for q in range(P)]
    # shared decode table for the [silent | singles | pairs] flag space
    sil_tab = ([0] + [SGL[m] + Km1 - 1 for m in range(N)]
               + [PAIR[r] + Km1 * Km1 - 1 for r in range(P)])

    def kernel(flags_ref, rings_ref, rowcol_ref, xT_ref, lab_ref, x_s):
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _init():
            x_s[0:1, :] = xT_ref[0]

        sub = jax.lax.broadcasted_iota(jnp.int32, (KP, G), 0)

        def decode_tab(f):
            out = jnp.full(f.shape, sil_tab[0], jnp.int32)
            for k in range(1, len(sil_tab)):
                out = jnp.where(f == k, sil_tab[k], out)
            return out

        for s in range(CH - 1, -1, -1):
            def step(s=s):
                x = x_s[0:1, :]
                lab_ref[0, s:s + 1, :] = x
                from_sil = decode_tab(flags_ref[0, s * F:s * F + 1, :])

                # --- single region: neuron n, slot k
                xs1 = x - 1
                n_idx = xs1 // Km1
                k_idx = xs1 % Km1
                f_on = jnp.zeros_like(x)
                rf = jnp.zeros_like(x)
                for n in range(N):
                    f_on = jnp.where(
                        n_idx == n,
                        flags_ref[0, s * F + 1 + n: s * F + 2 + n, :], f_on)
                    plane = rings_ref[
                        0, s * NR + n * KP: s * NR + (n + 1) * KP,
                        :].astype(jnp.int32)
                    v = jnp.sum(jnp.where(sub == k_idx, plane, 0), axis=0,
                                keepdims=True)
                    rf = jnp.where(n_idx == n, v, rf)
                from_on = decode_tab(f_on)
                from_ring = x - 1                         # rf == 0
                for n in range(N):
                    for cidx, (q, n_is_i) in enumerate(qn[n], start=1):
                        tgt = (PAIR[q] + (k_idx - 1) * Km1 + (Km1 - 1)
                               if n_is_i else
                               PAIR[q] + (Km1 - 1) * Km1 + (k_idx - 1))
                        from_ring = jnp.where(
                            (n_idx == n) & (rf == cidx), tgt, from_ring)
                from_sgl = jnp.where(k_idx == 0, from_on, from_ring)

                # --- pair region: pair q, grid (a, b)
                xp = x - (1 + N * Km1)
                q_idx = xp // (Km1 * Km1)
                gg = xp % (Km1 * Km1)
                a = gg // Km1
                b = gg % Km1
                f_c = jnp.zeros_like(x)
                prf = jnp.zeros_like(x)
                pcf = jnp.zeros_like(x)
                for q in range(P):
                    f_c = jnp.where(
                        q_idx == q,
                        flags_ref[0, s * F + 1 + N + q:
                                  s * F + 2 + N + q, :], f_c)
                    rp = rowcol_ref[
                        0, s * RC + q * KP: s * RC + (q + 1) * KP,
                        :].astype(jnp.int32)
                    v = jnp.sum(jnp.where(sub == b, rp, 0), axis=0,
                                keepdims=True)
                    prf = jnp.where(q_idx == q, v, prf)
                    cp = rowcol_ref[
                        0, s * RC + (P + q) * KP:
                        s * RC + (P + q + 1) * KP, :].astype(jnp.int32)
                    v2 = jnp.sum(jnp.where(sub == a, cp, 0), axis=0,
                                 keepdims=True)
                    pcf = jnp.where(q_idx == q, v2, pcf)
                from_corner = decode_tab(f_c)
                from_row = jnp.zeros_like(x)
                from_col = jnp.zeros_like(x)
                for q, (i, j) in enumerate(pairs):
                    fr = SGL[j] + b - 1
                    for cidx, (r, adv_is_i) in enumerate(row_tab[q],
                                                         start=1):
                        tgt = (PAIR[r] + (b - 1) * Km1 + (Km1 - 1)
                               if adv_is_i else
                               PAIR[r] + (Km1 - 1) * Km1 + (b - 1))
                        fr = jnp.where(prf == cidx, tgt, fr)
                    from_row = jnp.where(q_idx == q, fr, from_row)
                    fc2 = SGL[i] + a - 1
                    for cidx, (r, adv_is_i) in enumerate(col_tab[q],
                                                         start=1):
                        tgt = (PAIR[r] + (a - 1) * Km1 + (Km1 - 1)
                               if adv_is_i else
                               PAIR[r] + (Km1 - 1) * Km1 + (a - 1))
                        fc2 = jnp.where(pcf == cidx, tgt, fc2)
                    from_col = jnp.where(q_idx == q, fc2, from_col)
                from_pair = jnp.where(
                    (a == 0) & (b == 0), from_corner,
                    jnp.where(a == 0, from_row,
                              jnp.where(b == 0, from_col, x - Km1 - 1)))

                x_prev = jnp.where(
                    x == 0, from_sil,
                    jnp.where(x < 1 + N * Km1, from_sgl, from_pair))
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


@partial(jax.jit, static_argnames=("N", "Km1", "interpret"))
def _backtrace_native(flags_g, rings_g, rowcol_g, xT_g, *, N: int, Km1: int,
                      interpret=False):
    """Lane-parallel backtrace on the kernel's native (Bg, ..., G) layout;
    the chunk axis runs in REVERSE through the index maps."""
    KP = _kp(Km1 + 1)
    pairs, qn, row_tab, col_tab = _tables(N)
    P = len(pairs)
    F = 1 + N + P
    Bg = flags_g.shape[0]
    W = flags_g.shape[1] // F
    Wc = W // CH
    kernel = _make_bt_kernel(N, Km1, KP, Wc, pairs, qn, row_tab, col_tab)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Bg, W, G), jnp.int32),
        grid=(Bg, Wc),
        in_specs=[
            pl.BlockSpec((1, CH * F, G), lambda b, c: (b, Wc - 1 - c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CH * N * KP, G),
                         lambda b, c: (b, Wc - 1 - c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CH * 2 * P * KP, G),
                         lambda b, c: (b, Wc - 1 - c, 0),
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
    )(flags_g, rings_g, rowcol_g, xT_g)


def ovn_decode_pallas_mb(y_win, lp, mu, sigma, *, silent_start0=True,
                         silent_mask=None, interpret=False):
    """(B, W) windows -> (B, W) int32 labels for the general-N pairwise-
    overlap space via the fused multi-block forward + lane-parallel
    backtrace. Labels bit-match ring_viterbi_ovn in the same dtype."""
    B, W = y_win.shape
    K, N = jnp.asarray(mu).shape
    flags_g, rings_g, rowcol_g, xT_g = _forward_native(
        y_win, lp, mu, sigma, silent_start0=silent_start0,
        silent_mask=silent_mask, interpret=interpret)
    labels_g = _backtrace_native(flags_g, rings_g, rowcol_g, xT_g,
                                 N=N, Km1=K - 1, interpret=interpret)
    Bg = labels_g.shape[0]
    return labels_g.transpose(0, 2, 1).reshape(Bg * G, W)[:B]


# --- multi-channel front-end: same dynamics, factorized-stream emission ---
#
# The MC emission (core/emission_mc.py) collapses the channel axis OUTSIDE
# the kernel — es/d streams from one (T, C) x (C, N*(K-1)) MXU matmul — so
# the kernel consumes the same numbers as the XLA MC scan engines
# (ops/ring_viterbi_mc.py) and labels bit-match them: eb = (es + d) - c1,
# ep[q] = ((es + d_i) + d_j) - c2[q], identical float association.
# The static c2 table is stored lane-minor (P*KP, KP, 1) and splat across
# lanes in-kernel (a (P*KP, KP, G) copy would be 6.3 MB of VMEM at N=3).

CHM = 8          # MC window steps per grid chunk (d slabs are NR rows/step)


def ovn_mc_mb_vmem_bytes(N: int, K: int) -> int:
    """Per-program VMEM estimate for the MC kernel: state + two live grid
    temporaries + the streamed d-slab input + flag outputs (CHM steps)."""
    P = N * (N - 1) // 2
    KP = _kp(K)
    grid = KP * KP * G * 4
    NR = N * KP
    d_in = CHM * NR * G * 4 * 2            # double-buffered DMA
    out = (CHM * (1 + N + P) * G * 4 + CHM * NR * G + CHM * 2 * P * KP * G)
    return (P + 2) * grid + NR * G * 4 + d_in + out + 2 * NR * G * 4


def ovn_mc_mb_vmem_ok(N: int, K: int, ceiling: int | None = None) -> bool:
    if ceiling is None:
        ceiling = _gate_ceiling()
    return ovn_mc_mb_vmem_bytes(N, K) * VMEM_SLOP_MC <= ceiling


@partial(jax.jit, static_argnames=("interpret",))
def _forward_native_mc(es_win, d_win, lp, c1, c2, silent_mask, *,
                       interpret=False):
    """Fused general-N multi-block MC forward from precomputed emission
    streams. es_win (B, W); d_win (B, W, N, K-1); c1 (N, K-1) single
    energies; c2 (P, K-1, K-1) pair energies (pairs i-major); silent_mask
    (B,) bool. Outputs in the kernel's native (Bg, ..., G) layout."""
    B, W = es_win.shape
    _, _, N, Km1 = d_win.shape
    K = Km1 + 1
    KP = _kp(K)
    NR = N * KP
    if N < 2:
        raise ValueError("general-N overlap kernel needs N >= 2")
    if W % CHM != 0:
        raise ValueError(f"W={W} must be a multiple of CHM={CHM}")
    Wc = W // CHM
    Bg = _round_up(B, G) // G
    Bp = Bg * G
    dtype = jnp.float32
    pairs, qn, row_tab, col_tab = _tables(N)
    P = len(pairs)
    F = 1 + N + P

    lp = jnp.asarray(lp, dtype)
    lpz = jnp.log1p(-jnp.exp(jnp.sum(lp)))
    consts = jnp.concatenate([lpz[None], lp])[None, :]        # (1, 1+N)

    # streams onto lanes: block b_global = bg * G + g
    es_p = jnp.zeros((Bp, W), dtype).at[:B].set(es_win.astype(dtype))
    es_in = es_p.reshape(Bg, G, W).transpose(0, 2, 1)         # (Bg, W, G)
    d_p = jnp.zeros((Bp, W, N, KP), dtype).at[:B, :, :, :Km1].set(
        d_win.astype(dtype))
    d_in = d_p.reshape(Bg, G, W, NR).transpose(0, 2, 3, 1).reshape(
        Bg, W * NR, G)

    c1b = jnp.full((NR, 1), 0.0, dtype).at[
        (jnp.arange(N)[:, None] * KP + jnp.arange(Km1)[None, :]).reshape(-1)
    ].set(jnp.asarray(c1, dtype).reshape(-1, 1))
    c1b = jnp.broadcast_to(c1b, (NR, G))
    c2t = jnp.zeros((P * KP, KP, 1), dtype)
    for q in range(P):
        c2t = c2t.at[q * KP:q * KP + Km1, :Km1, 0].set(
            jnp.asarray(c2[q], dtype))

    sil = jnp.zeros((Bp,), jnp.int32).at[:B].set(
        jnp.asarray(silent_mask).astype(jnp.int32))
    sil_in = sil.reshape(Bg, G)[:, None, :]                   # (Bg, 1, G)

    def em_factory(em_refs):
        es_ref, d_ref, consts_ref, c1_ref, c2_ref = em_refs
        lpz_k = consts_ref[0, 0]
        lp_k = [consts_ref[0, 1 + n] for n in range(N)]

        def em_all(s):
            es = es_ref[0, s:s + 1, :]                        # (1, G)
            d = d_ref[0, s * NR:(s + 1) * NR, :]              # (NR, G)
            eb = (es + d) - c1_ref[...]

            def ep_fn(q):
                i, j = pairs[q]
                esdi = es + d[i * KP:(i + 1) * KP, :]     # (KP, G)
                dj = d[j * KP:(j + 1) * KP, :]
                # c2 stays lane-minor (KP, KP, 1): the subtract broadcasts
                # across lanes implicitly — no (KP, KP, G) copy of the
                # static table is ever materialized
                return ((esdi[:, None, :]) + dj[None, :, :]
                        - c2_ref[q * KP:(q + 1) * KP, :, :])

            return es, eb, ep_fn

        return lpz_k, lp_k, em_all

    kernel = _make_fwd_kernel(N, Km1, KP, Wc, pairs, qn, row_tab, col_tab,
                              em_factory, 5, CHM)
    in_specs = [
        pl.BlockSpec((1, CHM, G), lambda b, c: (b, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CHM * NR, G), lambda b, c: (b, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1 + N), lambda b, c: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((NR, G), lambda b, c: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((P * KP, KP, 1), lambda b, c: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, G), lambda b, c: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((1, CHM * F, G), lambda b, c: (b, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CHM * NR, G), lambda b, c: (b, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CHM * 2 * P * KP, G), lambda b, c: (b, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, G), lambda b, c: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((Bg, W * F, G), jnp.int32),
        jax.ShapeDtypeStruct((Bg, W * NR, G), jnp.int8),
        jax.ShapeDtypeStruct((Bg, W * 2 * P * KP, G), jnp.int8),
        jax.ShapeDtypeStruct((Bg, 1, G), jnp.int32),
    ]
    scratch = [
        pltpu.VMEM((8, G), jnp.float32),
        pltpu.VMEM((NR, G), jnp.float32),
        pltpu.VMEM((P * KP, KP, G), jnp.float32),
    ]
    return pl.pallas_call(
        kernel, out_shape=out_shape, grid=(Bg, Wc), in_specs=in_specs,
        out_specs=out_specs, scratch_shapes=scratch, interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
    )(es_in, d_in, consts, c1b, c2t, sil_in)


def ovn_mc_decode_pallas_mb(es_win, d_win, lp, c1, c2, *, silent_mask,
                            interpret=False):
    """(B, W) MC stream windows -> (B, W) int32 labels for the general-N
    pairwise-overlap space. Inputs are the factorized emission streams of
    core/emission_mc.mc_streams, windowed (es_win (B, W), d_win
    (B, W, N, K-1)) plus the static c1/c2 energy tables; labels bit-match
    ops/ring_viterbi_mc._ovn_mc_scan (both consume the identical projected
    streams, and the dynamics/backtrace are shared with the single-channel
    kernel)."""
    B, W = es_win.shape
    N, Km1 = d_win.shape[2], d_win.shape[3]
    # the MC forward uses CHM-step chunks; the shared backtrace uses
    # CH-step chunks — W must divide both (max(CH, CHM) covers both since
    # CH % CHM == 0), else the backtrace grid would silently cover only
    # floor(W / CH) * CH of the W steps
    step = max(CH, CHM)
    if W % step != 0:
        raise ValueError(f"W={W} must be a multiple of {step} "
                         "(forward CHM chunks AND backtrace CH chunks)")
    flags_g, rings_g, rowcol_g, xT_g = _forward_native_mc(
        es_win, d_win, lp, c1, c2, silent_mask, interpret=interpret)
    labels_g = _backtrace_native(flags_g, rings_g, rowcol_g, xT_g,
                                 N=N, Km1=Km1, interpret=interpret)
    Bg = labels_g.shape[0]
    return labels_g.transpose(0, 2, 1).reshape(Bg * G, W)[:B]
