"""Overlap-save time-parallel Viterbi: halo decode + silence-snapped seams.

The TPU analog of the reference's sequential silence-snapping chunker
(src/fit.jl:11-42): the reference decodes a chunk, retracts the right edge
to the last all-silent sample, and restarts the next chunk from silence.
Here every block decodes *in parallel* over a halo-extended window, and each
seam is snapped to a sample where the two adjacent block decodes agree on
silence:

* block b's window is [b*L - H, b*L + L + H) clamped into [0, T] — the first
  window starts exactly at sample 0 (reproducing the reference's
  emission-only init + forced silent start, src/viterbi.jl:56-63) and the
  last ends exactly at T (reproducing the argmax termination), so the signal
  edges are bit-faithful to the sequential engine; interior windows use
  emission-only init, absorbed by the halo (a spike spans at most K samples
  and silence is frequent, so H >> K makes the core decode independent of
  the init — the same renewal property the reference's chunker relies on);
* for the seam at p = (b+1)*L, both adjacent blocks decode the window
  [p-H, p+H); the cut q is the *last* sample <= p where both decodes are
  all-silent (matching the reference's retract-to-last-silence), else the
  first such sample > p; the left block supplies labels before the cut, the
  right block from the cut;
* a per-seam `seam_ok` flag reports whether a common silent sample existed
  (if not, the cut falls at p and the decode may disagree with the
  sequential engine there — callers can re-decode flagged seams).

Everything is fixed-shape: one compile per (T, L, H, topology). All blocks
decode under one vmap; stitching is pure gathers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.emission import emission_logprob


def _decode_blocks(em_win, v0, in_idx, in_w):
    """vmapped Viterbi over (B, W, S) emission windows with per-block init
    score vectors v0 (B, S) -> (B, W) labels."""

    def decode_one(em, v_init):
        def step(carry, em_t):
            cand = carry[in_idx] + in_w
            best = jnp.argmax(cand, axis=1)
            mx = jnp.take_along_axis(cand, best[:, None], axis=1)[:, 0]
            bp = jnp.take_along_axis(in_idx, best[:, None], axis=1)[:, 0]
            bp = jnp.where(jnp.isfinite(mx), bp, 0).astype(jnp.int32)
            return mx + em_t, bp

        vT, bps = jax.lax.scan(step, v_init, em[1:])
        xT = jnp.argmax(vT).astype(jnp.int32)

        def back(x_next, bp_t):
            x_prev = bp_t[x_next]
            return x_prev, x_prev

        _, xs = jax.lax.scan(back, xT, bps, reverse=True)
        return jnp.concatenate([xs, xT[None]])

    return jax.vmap(decode_one)(em_win, v0)


@partial(jax.jit, static_argnames=("L", "H"))
def overlap_save_viterbi(y, in_idx, in_w, state_mu, sigma, *, L: int, H: int):
    """Parallel overlap-save decode of one sequence.

    Args:
      y: (T,) observations; T must be a multiple of L and >= L + 2H.
      L: core block length. H: halo length (choose H >= a few K).

    Returns:
      x: (T,) labels; seam_ok: (B-1,) bool per interior seam.
    """
    if L < 2 * H:
        raise ValueError("need L >= 2H so seam cuts are monotone")
    dtype = state_mu.dtype
    y = y.astype(dtype)
    T = y.shape[0]
    if T % L != 0:
        raise ValueError(f"T={T} must be a multiple of L={L}")
    B = T // L
    W = L + 2 * H
    if B > 1 and T < W:
        raise ValueError(f"T={T} must be >= L + 2H = {W}")

    em = emission_logprob(y, state_mu, sigma)            # (T, S)

    if B == 1:
        # single block: exactly the sequential engine's semantics
        v0 = em[0].at[0].set(jnp.asarray(0.0, dtype))
        x = _decode_blocks(em[None], v0[None], in_idx, in_w)[0]
        return x, jnp.ones((0,), bool)

    # window starts, clamped so every window lies inside the signal
    starts = jnp.clip(jnp.arange(B) * L - H, 0, T - W)   # (B,)
    win_idx = starts[:, None] + jnp.arange(W)[None, :]   # (B, W)
    em_win = em[win_idx]                                 # (B, W, S)
    # emission-only init per block; block 0 gets the forced silent start
    v0 = em_win[:, 0, :]
    v0 = v0.at[0, 0].set(jnp.asarray(0.0, dtype))

    xb = _decode_blocks(em_win, v0, in_idx, in_w)        # (B, W)

    # Seam s between blocks s, s+1 at absolute p=(s+1)*L, window [p-H, p+H).
    p = (jnp.arange(B - 1) + 1) * L                      # (B-1,)
    offs = jnp.arange(2 * H)                             # window offsets
    left_pos = (p - H - starts[:-1])[:, None] + offs[None, :]   # (B-1, 2H)
    right_pos = (p - H - starts[1:])[:, None] + offs[None, :]
    left = jnp.take_along_axis(xb[:-1], left_pos, axis=1)
    right = jnp.take_along_axis(xb[1:], right_pos, axis=1)
    both_silent = (left == 0) & (right == 0)             # (B-1, 2H)
    # last common-silent offset <= H (retract-to-silence), else first > H,
    # else H (raw cut, flagged)
    le_mask = both_silent & (offs[None, :] <= H)
    gt_mask = both_silent & (offs[None, :] > H)
    has_le = jnp.any(le_mask, axis=1)
    has_gt = jnp.any(gt_mask, axis=1)
    last_le = (2 * H - 1) - jnp.argmax(le_mask[:, ::-1], axis=1)
    first_gt = jnp.argmax(gt_mask, axis=1)
    q = jnp.where(has_le, last_le, jnp.where(has_gt, first_gt, H))
    seam_ok = has_le | has_gt                            # (B-1,)

    # Stitch: block b owns absolute range [cut_{b-1}, cut_b).
    cuts = (p - H) + q                                   # (B-1,) absolute
    t_abs = jnp.arange(T)
    owner = jnp.searchsorted(cuts, t_abs, side="right")  # (T,)
    rel = t_abs - starts[owner]
    x = xb[owner, rel]
    return x, seam_ok


@partial(jax.jit, static_argnames=())
def _decode_blocks_from_y(y_win, sil, in_idx, in_w, state_mu, sigma):
    """Like _decode_blocks but computes emissions inside the scan step, so
    the (B, W, S) emission tensor is never materialized — required for
    overlap state spaces (S ~ 10^3-10^4) at long T. sil: (B,) bool — rows
    with the reference's forced silent start (the block containing sample
    0, src/viterbi.jl:63)."""
    dtype = state_mu.dtype
    sigma = jnp.asarray(sigma, dtype)
    log_sigma = jnp.log(sigma)
    inv_2s2 = 1.0 / (2.0 * sigma * sigma)

    from ..utils.logmath import HALF_LOG_2PI

    def em(v):
        d = v - state_mu
        return -HALF_LOG_2PI - log_sigma - d * d * inv_2s2

    def decode_one(yy, v_init):
        def step(carry, y_t):
            cand = carry[in_idx] + in_w
            best = jnp.argmax(cand, axis=1)
            mx = jnp.take_along_axis(cand, best[:, None], axis=1)[:, 0]
            bp = jnp.take_along_axis(in_idx, best[:, None], axis=1)[:, 0]
            bp = jnp.where(jnp.isfinite(mx), bp, 0).astype(jnp.int32)
            return mx + em(y_t), bp

        vT, bps = jax.lax.scan(step, v_init, yy[1:])
        xT = jnp.argmax(vT).astype(jnp.int32)

        def back(x_next, bp_t):
            return bp_t[x_next], bp_t[x_next]

        _, xs = jax.lax.scan(back, xT, bps, reverse=True)
        return jnp.concatenate([xs, xT[None]])

    v0 = jax.vmap(em)(y_win[:, 0])
    S = state_mu.shape[0]
    v0 = jnp.where(sil[:, None] & (jnp.arange(S) == 0)[None, :],
                   jnp.asarray(0.0, dtype), v0)
    return jax.vmap(decode_one)(y_win, v0)


def overlap_save_decode_long(y, in_idx, in_w, state_mu, sigma, *, L: int,
                             H: int, blocks_per_call: int = 8,
                             block_decoder=None, prefetch: int = 2,
                             window_dtype=None, event_spec=None):
    """Host-driven overlap-save decode of arbitrarily long signals.

    Streams batches of `blocks_per_call` halo-extended blocks through the
    device (backpointer memory is bounded by blocks_per_call * (L+2H) * S),
    then snaps every seam to common silence and stitches on the host —
    the production path for overlap state spaces where S^2 operators and
    whole-signal emission tensors don't fit (SURVEY.md §2b).

    `block_decoder`, if given, replaces the generic gather engine: a
    callable ((B, W, ...) float windows, (B,) bool silent-start rows) ->
    (B, W) integer labels (e.g. the ring-structured fast path,
    ops/ring_viterbi.ring_block_decoder, which returns int16 when the
    state space fits). With a block_decoder, y may be multi-channel
    (T, C) — windows are sliced along time, keeping trailing axes
    (ops/ring_viterbi_mc.mc_block_decoder) — and in_idx/in_w/state_mu
    may be None; `window_dtype` then sets the window cast (default:
    the JAX default float width, matching the one-shot MC path).

    `prefetch` is the double-buffering depth: up to that many chunk calls
    are dispatched before the oldest is fetched, so the host-side window
    build + H2D transfer of chunk k+1 and the D2H label fetch of chunk k
    run under the device compute of the chunks in between (JAX dispatch is
    asynchronous; the fetch is the only blocking point). At most
    `prefetch` (blocks_per_call, W) input windows are live on the device.
    prefetch=1 reproduces the strictly serial dispatch-then-fetch loop.

    `event_spec=(N, K, overlaps)` (requires block_decoder) switches each
    chunk's D2H transfer to the packed spike-event blob (core/events.py,
    ~16x smaller at K=60); labels are reconstructed exactly on the host —
    each window's decode is a valid path, so no fallback is needed.

    Returns (x (T,) int32, seam_ok (B-1,) bool).
    """
    if L < 2 * H:
        raise ValueError("need L >= 2H so seam cuts are monotone")
    if prefetch < 1:
        raise ValueError("prefetch must be >= 1")
    if event_spec is not None:
        if block_decoder is None:
            raise ValueError("event_spec requires a block_decoder")
        from ..core.events import (make_events_block_decoder,
                                   unpack_window_blob)

        eN, eK, eov = event_spec
        block_decoder = make_events_block_decoder(block_decoder, N=eN,
                                                  K=eK, overlaps=eov)
    y = np.asarray(y)
    T = len(y)
    Tp = -(-T // L) * L                    # seam grid; windows themselves
    B = Tp // L                            # never extend past the real T
    W = L + 2 * H
    if T < W:
        raise ValueError("signal shorter than one window; decode directly")
    starts = np.clip(np.arange(B) * L - H, 0, T - W)
    starts[-1] = T - W                     # real termination at T, not pad
    labels = np.empty((B, W), np.int32)
    if window_dtype is not None:
        dtype = np.dtype(window_dtype)
    elif state_mu is not None:
        dtype = np.dtype(state_mu.dtype)
    else:
        dtype = np.dtype(np.float64 if jax.config.jax_enable_x64
                         else np.float32)

    from collections import deque

    pending = deque()                      # (c0, c1, device labels)

    def fetch_oldest():
        p0, p1, dev = pending.popleft()
        if event_spec is not None:
            lab = unpack_window_blob(dev, B=blocks_per_call, W=W, N=eN,
                                     K=eK, overlaps=eov)
        else:
            lab = np.asarray(dev)
        labels[p0:p1] = lab[: p1 - p0]

    for c0 in range(0, B, blocks_per_call):
        c1 = min(c0 + blocks_per_call, B)
        idx = starts[c0:c1, None] + np.arange(W)[None, :]
        y_win = y[idx].astype(dtype)       # windows never touch the pad
        if c1 - c0 < blocks_per_call:      # keep one compiled shape
            padb = blocks_per_call - (c1 - c0)
            y_win = np.concatenate(
                [y_win, np.zeros((padb, W) + y.shape[1:], dtype)])
        # the block containing sample 0 gets the reference's forced
        # silent start (src/viterbi.jl:63)
        sil = np.zeros(len(y_win), bool)
        if c0 == 0:
            sil[0] = True
        if block_decoder is not None:
            out = block_decoder(jnp.asarray(y_win), jnp.asarray(sil))
        else:
            out = _decode_blocks_from_y(
                jnp.asarray(y_win), jnp.asarray(sil), in_idx, in_w,
                state_mu, sigma)
        pending.append((c0, c1, out))
        if len(pending) >= prefetch:
            fetch_oldest()
    while pending:
        fetch_oldest()

    # host-side seam snap + stitch (same protocol as overlap_save_viterbi);
    # the last seam's window is clamped to the true signal end
    x = np.empty(T, np.int32)
    seam_ok = np.ones(B - 1, bool)
    cuts = np.empty(B - 1, np.int64)
    for s in range(B - 1):
        p = (s + 1) * L
        lo, hi = p - H, min(p + H, T)
        lw = labels[s, lo - starts[s] : hi - starts[s]]
        rw = labels[s + 1, lo - starts[s + 1] : hi - starts[s + 1]]
        both = (lw == 0) & (rw == 0)
        offs = np.arange(hi - lo)
        le = np.nonzero(both & (offs <= H))[0]
        gt = np.nonzero(both & (offs > H))[0]
        if len(le):
            q = le[-1]
        elif len(gt):
            q = gt[0]
        else:
            q = H
            seam_ok[s] = False
        cuts[s] = lo + q
    bounds = np.concatenate([[0], cuts, [T]])
    for b in range(B):
        a, e = bounds[b], bounds[b + 1]
        x[a:e] = labels[b, a - starts[b] : e - starts[b]]
    return x, seam_ok


def ring_overlap_save(y, lp, mu, sigma, *, L: int, H: int, overlaps: bool,
                      block_engine: str = "auto"):
    """Fully on-device overlap-save decode with the ring engines.

    One jitted program: window build, all block decodes (vmap), seam snap,
    and stitch all execute on the device — the signal is transferred once
    and only the final labels come back. This is the production single-chip
    decode path (the chunked host driver above exists for signals whose
    backpointer footprint exceeds HBM).

    block_engine selects the per-block forward implementation:
      "ring"   the vmapped XLA ring scan (any supported topology/backend);
      "pallas" the fused multi-block kernels — overlap spaces on a TPU
               backend with K <= 65: N=2 uses ops/pallas_viterbi_mb
               (window (L+2H) % 32 == 0), N >= 3 the general-N kernel
               ops/pallas_viterbi_ovn_mb (window % 16 == 0, VMEM-budget
               gated — N=4 pair grids exceed a 16 MB core);
               bit-identical labels, ~3-40x the XLA scan device-side;
      "auto"   pallas when all of its conditions hold, else ring.

    Same seam protocol and edge handling as overlap_save_viterbi; block 0
    keeps the reference's forced silent start. Returns (x (T,), seam_ok).
    """
    if L < 2 * H:
        raise ValueError("need L >= 2H so seam cuts are monotone")
    lp = jnp.asarray(lp)
    mu = jnp.asarray(mu)
    K, N = mu.shape
    block_engine = resolve_block_engine(block_engine, overlaps, K, N,
                                        L + 2 * H)
    return _ring_overlap_save_impl(jnp.asarray(y), lp, mu,
                                   jnp.asarray(sigma), L=L, H=H,
                                   overlaps=overlaps,
                                   block_engine=block_engine)


def resolve_block_engine(block_engine, overlaps, K, N, W):
    """Map "auto"/"pallas" to the concrete usable engine for this topology:
    "pallas" (the N=2 kernel), "pallas_ovn" (general N >= 3), or "ring".
    Explicit names are validated: a typo must not silently decode with a
    different engine, and a forced Pallas kernel on an unusable
    backend/topology raises here with a clear message instead of dying
    inside Mosaic lowering."""
    if block_engine not in ("auto", "pallas", "pallas_ovn", "ring"):
        raise ValueError(f"unknown block_engine {block_engine!r}; expected "
                         "'auto', 'ring', 'pallas', or 'pallas_ovn'")
    if block_engine == "ring":
        return "ring"
    from ..ops import pallas_viterbi_ovn_mb as povn
    from ..ops.pallas_viterbi_mb import CH, KP

    from ..utils.platform import is_tpu_backend

    on_tpu = is_tpu_backend()
    ok_ov2 = (overlaps and N == 2 and K - 1 <= KP and W % CH == 0
              and on_tpu)
    ok_ovn = (overlaps and N >= 2 and K - 1 <= 64 and W % povn.CH == 0
              and on_tpu and povn.ovn_mb_vmem_ok(N, K))
    if block_engine == "pallas_ovn":
        if not ok_ovn:
            raise ValueError(
                "block_engine='pallas_ovn' requires an overlap topology "
                f"with K <= 65, window (L+2H) divisible by {povn.CH}, a "
                "TPU backend, and a VMEM-feasible N")
        return "pallas_ovn"
    if ok_ov2:
        return "pallas"
    if ok_ovn and N >= 3:
        return "pallas_ovn"
    if block_engine == "pallas":
        raise ValueError(
            "block_engine='pallas' requires an overlap topology with "
            f"K <= {KP + 1}, window (L+2H) divisible by {CH} (N=2) or "
            f"{povn.CH} (N>=3, VMEM-budget permitting), and a TPU backend")
    return "ring"


@partial(jax.jit, static_argnames=("L", "H", "overlaps", "block_engine"))
def _ring_overlap_save_impl(y, lp, mu, sigma, *, L, H, overlaps,
                            block_engine="ring"):
    from ..ops.ring_viterbi import ring_viterbi_nov, ring_viterbi_ov2
    from ..ops.ring_viterbi_ovn import ring_viterbi_ovn

    # N < 2: overlap space == non-overlap space (no pair columns)
    if not overlaps or mu.shape[1] < 2:
        engine = ring_viterbi_nov
    elif mu.shape[1] == 2:
        engine = ring_viterbi_ov2
    else:
        engine = ring_viterbi_ovn

    # Gather-free throughout: the window matrix is built from a single
    # reshape, seam windows are static slices, and the stitch is a
    # 3-way where over aligned label grids — XLA lowers generic gathers
    # to scalar loops on TPU, which would dominate everything else.
    dtype = mu.dtype
    y = y.astype(dtype)
    T = y.shape[0]
    B = -(-T // L)
    Tp = B * L
    W = L + 2 * H

    K, Nn = mu.shape
    S = (1 + Nn * (K - 1) + (Nn * (Nn - 1) // 2) * (K - 1) ** 2
         if overlaps else 1 + Nn * (K - 1))
    # labels as int16 when they fit: halves the device->host transfer,
    # which dominates end-to-end wall time on tunneled backends
    out_dtype = jnp.int16 if S <= 32767 else jnp.int32

    if B == 1 or T < W:
        # whole signal in one exact decode (no padding: fake trailing
        # zeros would alter the argmax termination the reference takes
        # at the true last sample, src/viterbi.jl:90)
        x = engine(y, lp, mu, sigma, silent_start=True,
                   with_ll=False)[0]
        return x.astype(out_dtype), jnp.ones((0,), bool)

    y_win, edge_rows = _build_windows(y, T=T, L=L, H=H, B=B, W=W)
    sil0 = jnp.arange(B) == 0       # forced silent start, block 0 only

    if block_engine == "pallas":
        from ..ops.pallas_viterbi_mb import ov2_decode_pallas_mb

        xb = ov2_decode_pallas_mb(y_win, lp, mu, sigma, silent_start0=True)
    elif block_engine == "pallas_ovn":
        from ..ops.pallas_viterbi_ovn_mb import ovn_decode_pallas_mb

        xb = ovn_decode_pallas_mb(y_win, lp, mu, sigma, silent_start0=True)
    else:
        xb = jax.vmap(
            lambda yy, s0: engine(yy, lp, mu, sigma, silent_start=s0,
                                  with_ll=False)[0])(y_win, sil0)

    x, seam_ok = _snap_and_stitch(xb, T=T, L=L, H=H, B=B,
                                  edge_rows=edge_rows)
    return x.astype(out_dtype), seam_ok


def _edge_rows(T, L, H, B, W):
    """Static {row: realign shift} map of the windows clamped to a real
    signal edge (pure int arithmetic — no arrays). Besides rows 0 and
    B-1, row B-2's right halo overruns T iff 0 < T mod L < H."""
    edge_rows = {0: H, B - 1: (T - W) - ((B - 1) * L - H)}
    if B >= 3 and (B - 1) * L + H > T:
        edge_rows[B - 2] = (T - W) - ((B - 2) * L - H)
    return edge_rows


def _build_windows(y, *, T, L, H, B, W):
    """Uniform halo windows: row b covers [b*L - H, b*L - H + W) of the
    H-zero-padded signal == rows of one reshape plus a shifted head.
    Rows whose uniform window would cross a real signal edge decode the
    real edge instead (reference-faithful init at sample 0, termination
    at T; zero-pad is fake silence that would bias the backtrace) and are
    rolled back into uniform coordinates after the decode.

    Returns (y_win (B, W), edge_rows {row: realign shift})."""
    Tp = B * L
    y_ext = jnp.pad(y, (H, Tp - T + (L - H)))        # length Tp + L
    A = y_ext.reshape(B + 1, L)
    y_win = jnp.concatenate([A[:B], A[1:, : 2 * H]], axis=1)  # (B, W)
    edge_rows = _edge_rows(T, L, H, B, W)
    for b in edge_rows:
        start = 0 if b == 0 else T - W
        y_win = y_win.at[b].set(jax.lax.dynamic_slice_in_dim(y, start, W))
    return y_win, edge_rows


def _snap_and_stitch(xb, *, T, L, H, B, edge_rows):
    """Silence-snap every seam and stitch (B, W) block labels into (T,).

    Returns (x (T,), seam_ok (B-1,)). Pure static slices/wheres; safely
    vmappable over a leading channel axis of xb."""
    Tp = B * L
    # realign edge rows to uniform window coordinates
    for b, shift in edge_rows.items():
        xb = xb.at[b].set(jnp.roll(xb[b], shift))

    # seam s at p=(s+1)L, window [p-H, p+H): static slices in uniform
    # coordinates
    left = xb[:-1, L : L + 2 * H]                    # (B-1, 2H)
    right = xb[1:, : 2 * H]
    both_silent = (left == 0) & (right == 0)
    offs = jnp.arange(2 * H)
    # positions at or past the true signal end hold rolled-in garbage on
    # the last row — never treat them as silence certificates
    p_all = (jnp.arange(B - 1) + 1) * L
    abs_pos = p_all[:, None] - H + offs[None, :]
    both_silent = both_silent & (abs_pos < T)
    le_mask = both_silent & (offs[None, :] <= H)
    gt_mask = both_silent & (offs[None, :] > H)
    has_le = jnp.any(le_mask, axis=1)
    has_gt = jnp.any(gt_mask, axis=1)
    last_le = (2 * H - 1) - jnp.argmax(le_mask[:, ::-1], axis=1)
    first_gt = jnp.argmax(gt_mask, axis=1)
    q = jnp.where(has_le, last_le, jnp.where(has_gt, first_gt, H))
    seam_ok = has_le | has_gt
    cuts = (jnp.arange(B - 1) + 1) * L - H + q       # (B-1,) absolute

    # stitch: position (b, i) (abs t = bL+i) is owned by b-1 if
    # t < cut_{b-1}, by b+1 if t >= cut_b, else by b. Neighbor labels
    # come from static slices of the adjacent rows.
    core = xb[:, H : H + L]                          # (B, L) self labels
    prev_full = jnp.zeros_like(core)
    prev_full = prev_full.at[1:, :H].set(xb[:-1, L + H : L + 2 * H])
    next_full = jnp.zeros_like(core)
    next_full = next_full.at[:-1, L - H :].set(xb[1:, :H])
    t_grid = (jnp.arange(B) * L)[:, None] + jnp.arange(L)[None, :]
    prev_cut = jnp.concatenate([jnp.zeros(1, cuts.dtype), cuts])
    next_cut = jnp.concatenate([cuts, jnp.full(1, Tp, cuts.dtype)])
    x = jnp.where(t_grid < prev_cut[:, None], prev_full,
                  jnp.where(t_grid >= next_cut[:, None], next_full,
                            core)).reshape(-1)
    return x[:T], seam_ok


def ring_overlap_save_batched(ys, lp, mu, sigma, *, L: int, H: int,
                              overlaps: bool, block_engine: str = "auto"):
    """Channel-batched production decode: (C, T) recordings -> (C, T)
    labels in ONE device program.

    The reference CLI processes channel 1 only (src/hmmsort.jl:56); this
    is the single-chip DP axis: every channel's overlap-save blocks are
    folded into one block batch (C*B windows) so the fused Pallas kernels
    decode all channels together, and the whole batch pays a single
    host<->device round trip — versus C serial calls each paying one
    (benchmarks/suite.py config 4). Same per-channel seam protocol and
    edge handling as ring_overlap_save; returns (x (C, T), seam_ok
    (C, B-1)).
    """
    if L < 2 * H:
        raise ValueError("need L >= 2H so seam cuts are monotone")
    ys = jnp.asarray(ys)
    lp = jnp.asarray(lp)
    mu = jnp.asarray(mu)
    if ys.shape[1] < L + 2 * H:
        raise ValueError("signal shorter than one window; decode directly")
    block_engine = resolve_block_engine(block_engine, overlaps, mu.shape[0],
                                        mu.shape[1], L + 2 * H)
    return _ring_overlap_save_batched_impl(
        ys, lp, mu, jnp.asarray(sigma), L=L, H=H, overlaps=overlaps,
        block_engine=block_engine)


@partial(jax.jit, static_argnames=("L", "H", "overlaps", "block_engine"))
def _ring_overlap_save_batched_impl(ys, lp, mu, sigma, *, L, H, overlaps,
                                    block_engine="ring"):
    from ..ops.ring_viterbi import ring_viterbi_nov, ring_viterbi_ov2
    from ..ops.ring_viterbi_ovn import ring_viterbi_ovn

    dtype = mu.dtype
    ys = ys.astype(dtype)
    C, T = ys.shape
    B = -(-T // L)
    W = L + 2 * H
    K, Nn = mu.shape
    S = (1 + Nn * (K - 1) + (Nn * (Nn - 1) // 2) * (K - 1) ** 2
         if overlaps else 1 + Nn * (K - 1))
    out_dtype = jnp.int16 if S <= 32767 else jnp.int32

    build = jax.vmap(partial(_build_windows_arrays, T=T, L=L, H=H, B=B, W=W))
    y_win = build(ys)                                # (C, B, W)
    edge_rows = _edge_rows(T, L, H, B, W)

    sil = jnp.zeros((C, B), bool).at[:, 0].set(True)
    y_flat = y_win.reshape(C * B, W)
    sil_flat = sil.reshape(C * B)

    if block_engine == "pallas":
        from ..ops.pallas_viterbi_mb import ov2_decode_pallas_mb

        xb = ov2_decode_pallas_mb(y_flat, lp, mu, sigma,
                                  silent_mask=sil_flat)
    elif block_engine == "pallas_ovn":
        from ..ops.pallas_viterbi_ovn_mb import ovn_decode_pallas_mb

        xb = ovn_decode_pallas_mb(y_flat, lp, mu, sigma,
                                  silent_mask=sil_flat)
    else:
        if not overlaps or Nn < 2:     # N < 2: no pair columns, nov exact
            engine = ring_viterbi_nov
        elif Nn == 2:
            engine = ring_viterbi_ov2
        else:
            engine = ring_viterbi_ovn
        xb = jax.vmap(
            lambda yy, s0: engine(yy, lp, mu, sigma, silent_start=s0,
                                  with_ll=False)[0])(y_flat, sil_flat)

    xb = xb.reshape(C, B, W)
    stitch = jax.vmap(partial(_snap_and_stitch, T=T, L=L, H=H, B=B,
                              edge_rows=edge_rows))
    x, seam_ok = stitch(xb)
    return x.astype(out_dtype), seam_ok


def _build_windows_arrays(y, *, T, L, H, B, W):
    """vmap-friendly wrapper: _build_windows minus the (static) edge_rows."""
    y_win, _ = _build_windows(y, T=T, L=L, H=H, B=B, W=W)
    return y_win


def resolve_block_engine_mc(block_engine, overlaps, K, N, W):
    """MC mirror of resolve_block_engine: the general-N MC kernel
    (ops/pallas_viterbi_ovn_mb._forward_native_mc) covers every overlap
    N >= 2; W must divide both its CHM chunks and the shared backtrace's
    CH chunks. Explicit names are validated (same contract as the
    single-channel resolver: typos and infeasible forced kernels raise)."""
    if block_engine not in ("auto", "pallas", "pallas_ovn", "ring"):
        raise ValueError(f"unknown block_engine {block_engine!r}; expected "
                         "'auto', 'ring', 'pallas', or 'pallas_ovn'")
    if block_engine == "ring":
        return "ring"
    from ..ops import pallas_viterbi_ovn_mb as povn

    from ..utils.platform import is_tpu_backend

    on_tpu = is_tpu_backend()
    step = max(povn.CH, povn.CHM)
    feasible = (overlaps and N >= 2 and K - 1 <= 64 and W % step == 0
                and on_tpu and povn.ovn_mc_mb_vmem_ok(N, K))
    if feasible:
        return "pallas_ovn"
    if block_engine in ("pallas", "pallas_ovn"):
        raise ValueError(
            f"block_engine={block_engine!r} (MC) requires an overlap "
            f"topology with K <= 65, window (L+2H) divisible by {step}, "
            "a TPU backend, and a VMEM-feasible N")
    return "ring"


def mc_overlap_save(yc, lp, mu, sigmas, *, L: int, H: int, overlaps: bool,
                    block_engine: str = "auto"):
    """Multi-channel parallel overlap-save decode (beyond-reference
    capability: the reference keeps channel 1 only, src/hmmsort.jl:56).

    yc: (T, C) observations; mu: (K, N, C) per-channel templates;
    sigmas: (C,) per-channel noise stds.

    The channel dimension collapses *before* the windows are built: the
    factorized MC emission (core/emission_mc.py) turns yc into the
    per-neuron projection streams (es, d) with one (T, C) x (C, N*(K-1))
    MXU matmul, and windowing commutes with that pointwise map — so the
    halo windows are built over the (1 + N*(K-1)) stream features, and the
    block decodes, seam snap, and stitch are exactly the single-channel
    machinery (same protocol as ring_overlap_save). Every topology is
    supported: non-overlap (any N), the specialized N=2 pair engine, and
    the table-driven any-N overlap engine.

    Returns (x (T,) int labels, seam_ok (B-1,) bool).
    """
    es, d, lp_d, c1, cx, block_engine = _mc_prepare(
        yc, lp, mu, sigmas, L=L, H=H, overlaps=overlaps,
        block_engine=block_engine)
    return _mc_overlap_save_impl(es, d, lp_d, c1, cx, L=L, H=H,
                                 overlaps=overlaps,
                                 block_engine=block_engine)


def _mc_prepare(yc, lp, mu, sigmas, *, L, H, overlaps, block_engine):
    """Shared MC front-end prep: resolve the engine, project the channel
    streams, and build the static energy tables (consumed by
    mc_overlap_save and the events-transfer wrapper in core/events.py)."""
    from ..core.emission_mc import MCTables, mc_streams

    if L < 2 * H:
        raise ValueError("need L >= 2H so seam cuts are monotone")
    K, N, C = np.shape(mu)
    block_engine = resolve_block_engine_mc(block_engine, overlaps, K, N,
                                           L + 2 * H)
    if block_engine == "pallas_ovn" and not overlaps:
        raise ValueError("block_engine='pallas_ovn' requires an overlap "
                         "topology (overlaps=True)")
    tables = MCTables(mu, sigmas)
    es, d = mc_streams(yc, tables)                       # (T,), (T, N, K-1)
    dtype = es.dtype
    c1 = jnp.asarray(tables.c1, dtype)
    if overlaps and N >= 2 and (N >= 3 or block_engine == "pallas_ovn"):
        cx = jnp.asarray(np.stack([tables.c2[p]          # ovn direct form
                                   for p in sorted(tables.c2)]), dtype)
    elif overlaps and N == 2:
        cx = jnp.asarray(tables.x2[(0, 1)], dtype)       # ov2 cross form
    else:
        # non-overlap — or N < 2, whose overlap space has no pair columns
        cx = jnp.zeros((0,), dtype)
    return es, d, jnp.asarray(lp, dtype), c1, cx, block_engine


@partial(jax.jit, static_argnames=("L", "H", "overlaps", "block_engine"))
def _mc_overlap_save_impl(es, d, lp, c1, cx, *, L, H, overlaps,
                          block_engine="ring"):
    from ..ops.ring_viterbi_mc import (_nov_mc_scan, _ov2_mc_scan,
                                      _ovn_mc_scan)

    T = es.shape[0]
    _, N, Km1 = d.shape
    B = -(-T // L)
    W = L + 2 * H
    S = (1 + N * Km1 + (N * (N - 1) // 2) * Km1 * Km1
         if overlaps else 1 + N * Km1)
    out_dtype = jnp.int16 if S <= 32767 else jnp.int32

    if not overlaps or N < 2:          # N < 2: no pair columns, nov exact
        dec = lambda e, dd, s0: _nov_mc_scan(e, dd, lp, c1,
                                             silent_start=s0,
                                             with_ll=False)[0]
    elif block_engine == "pallas_ovn" or N >= 3:
        # the pallas front-end and the any-N scan consume the same
        # direct-form pair tables (labels bit-match between them)
        dec = lambda e, dd, s0: _ovn_mc_scan(e, dd, lp, c1, cx,
                                             silent_start=s0,
                                             with_ll=False)[0]
    else:
        dec = lambda e, dd, s0: _ov2_mc_scan(e, dd, lp, c1, cx,
                                             silent_start=s0,
                                             with_ll=False)[0]

    if B == 1 or T < W:
        x = dec(es, d, True)
        return x.astype(out_dtype), jnp.ones((0,), bool)

    # window the stream features (pointwise in t, so windowing commutes
    # with the channel-collapsing projection)
    feats = jnp.concatenate([es[:, None], d.reshape(T, N * Km1)], axis=1)
    build = jax.vmap(partial(_build_windows_arrays, T=T, L=L, H=H, B=B, W=W))
    f_win = build(feats.T)                               # (F, B, W)
    edge_rows = _edge_rows(T, L, H, B, W)
    es_win = f_win[0]                                    # (B, W)
    d_win = f_win[1:].transpose(1, 2, 0).reshape(B, W, N, Km1)
    sil0 = jnp.arange(B) == 0

    if block_engine == "pallas_ovn":
        from ..ops.pallas_viterbi_ovn_mb import ovn_mc_decode_pallas_mb

        xb = ovn_mc_decode_pallas_mb(es_win, d_win, lp, c1, cx,
                                     silent_mask=sil0)
    else:
        xb = jax.vmap(dec)(es_win, d_win, sil0)          # (B, W)

    x, seam_ok = _snap_and_stitch(xb, T=T, L=L, H=H, B=B,
                                  edge_rows=edge_rows)
    return x.astype(out_dtype), seam_ok
