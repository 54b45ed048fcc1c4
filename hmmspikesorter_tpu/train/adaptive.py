"""Drift-adaptive template tracking — online EM with exponential forgetting.

Real recordings drift: electrode micro-motion changes spike amplitudes and
shapes over minutes, so one stationary template set mis-scores early or
late spikes. The reference family has no answer (templates are fit once,
src/baumwelch.jl, and the decode assumes them stationary). This module
tracks the templates THROUGH the recording with stepwise online EM
(sufficient-statistic blending, the Cappe-Moulines stepwise-EM scheme):

    for each chunk c (length Tc):
        s_c  <- em_chunk_stats(y_c; theta_{c-1}) / Tc        E-step
        sbar <- (1 - forget) * sbar + forget * s_c           blend
        theta_c <- M-step(sbar)                              train/em.py

All statistics are linear-space per-state sums (train/em.em_chunk_stats),
so the convex blend is exact, and the M-step formulas (shared with
em_step via _m_step_from_stats) are scale-invariant, so the per-sample
normalization only equalizes chunk lengths. `forget` sets the memory
horizon (~chunk/forget samples): forget=1 fits each chunk independently,
forget->0 freezes the start templates. The E-step runs on the same
engine ladder as training (fused Pallas EM kernels on TPU, halo-window
XLA scans, ring scans on CPU) — adaptation costs about one EM iteration
over the recording.

Decode (`decode_tracked`) then labels the whole recording in ONE parallel
device program: the overlap-save halo windows (parallel/overlap_save.py)
are vmapped over per-window (lp, mu, sigma) — window b is decoded with
the templates adapted to ITS span — and stitched with the standard
silence-snap seam protocol. A seam cut requires both neighbors to decode
silence at the cut, which is parameter-independent (state 0 means "no
template playing" under any theta), so the stitch certificate carries
over unchanged; flagged seams are auto-repaired with the seam's own
chunk parameters (parallel/seam_repair.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state_space import build_state_space
from .em import EMTables, _m_step_from_stats, em_chunk_stats, pallas_em_geometry

__all__ = ["DriftTrack", "track_drift", "decode_tracked",
           "track_drift_batched",
           "track_drift_mc", "decode_tracked_mc"]


@dataclasses.dataclass
class DriftTrack:
    """Per-chunk parameter trajectory from track_drift.

    lp (B, N), mu (B, K, N), sigma (B,): the parameters in force after
    each chunk's update; lls (B,): each chunk's predictive log-likelihood
    under the PRE-update parameters (a drift monitor: a persistent drop
    means the model is falling behind the drift); bounds: the (start,
    end) sample span of each chunk.

    Multi-channel tracks (track_drift_mc) carry mu (B, K, N, C) and
    per-channel sigmas in `sigma` (B, C); `is_mc` tells them apart.
    """

    lp: np.ndarray
    mu: np.ndarray
    sigma: np.ndarray
    lls: np.ndarray
    bounds: list[tuple[int, int]]
    chunk: int
    forget: float
    allow_overlaps: bool

    @property
    def n_chunks(self) -> int:
        return len(self.bounds)

    @property
    def is_mc(self) -> bool:
        return self.mu.ndim == 4

    def model_at(self, c: int):
        """HMMTemplateModel(MC) in force for chunk c (decode topology
        taken from the tracked model)."""
        if self.is_mc:
            from ..models.multichannel import HMMTemplateModelMC

            return HMMTemplateModelMC(self.mu[c], self.sigma[c],
                                      self.lp[c],
                                      allow_overlaps=self.allow_overlaps)
        from ..models.api import HMMTemplateModel

        return HMMTemplateModel(self.mu[c], float(self.sigma[c]),
                                self.lp[c],
                                allow_overlaps=self.allow_overlaps)


def _auto_fb_mode(K: int, N: int, Tc: int) -> tuple[str, int]:
    """Per-chunk-length E-step engine pick — the train_model auto rule
    (train/em._em_phase) applied to the chunk length."""
    from ..utils.platform import is_tpu_backend

    if jax.default_backend() == "cpu":
        return "ring", 256
    from ..ops.pallas_fb_mb import KP as _KP

    Lpk, _ = pallas_em_geometry(K, 2048)
    Hov = max(4 * K, 64)
    Lov = max(2048, 4 * Hov)
    if K - 1 <= _KP and 0 < N <= 8 and Tc >= 2 * Lpk and is_tpu_backend():
        return "overlap_pallas", 2048
    if Tc >= 2 * Lov:
        return "overlap", 2048
    return "blocked", 256


@partial(jax.jit, static_argnames=("K", "fb_mode", "block",
                                   "inner_steps", "kind"))
def _track_scan(y_blocks, lp0, mu0, sg0, forget, tables, *, K: int,
                fb_mode: str, block: int, inner_steps: int, kind: str):
    """The whole online-EM chunk loop as ONE compiled program: lax.scan
    over uniform chunks carrying (theta, blended statistics). The chunk
    recursion is inherently sequential, but nothing in it needs the
    host — running it on-device removes the per-chunk dispatch+fetch
    round trips that dominate wall time on remote-attached backends
    (measured: 64 chunks at T=2^21 took 17.7 s host-driven vs well
    under a second of device work).

    kind selects the single-channel ("sc") or multi-channel ("mc")
    statistics/M-step pair. Returns per-chunk stacked (lp, mu, sg, ll)
    plus the final carry's blended statistics (for a host-side
    ragged-tail update).
    """
    Tc = y_blocks.shape[1]
    dtype = mu0.dtype
    f = jnp.asarray(forget, dtype)

    if kind == "sc":
        N = mu0.shape[1]

        def stats_fn(y_c, lp, mu, sg):
            return em_chunk_stats(y_c, lp, mu, sg, tables, K=K,
                                  fb_mode=fb_mode, block=block)

        def m_step(sbar):
            return _m_step_from_stats(
                sbar[0], sbar[1], sbar[2], jnp.log(sbar[3]),
                jnp.log(sbar[4]), tables.states, dtype, K, N)
    else:
        from .em_mc import _m_step_from_stats_mc, em_chunk_stats_mc

        N, C = mu0.shape[1], mu0.shape[2]

        def stats_fn(y_c, lp, mu, sg):
            return em_chunk_stats_mc(y_c, lp, mu, sg, tables, K=K,
                                     fb_mode=fb_mode, block=block)

        def m_step(sbar):
            return _m_step_from_stats_mc(
                sbar[0], sbar[1], sbar[2], jnp.log(sbar[3]),
                jnp.log(sbar[4]), dtype, K, N, C)

    shapes = jax.eval_shape(stats_fn, y_blocks[0], lp0, mu0, sg0)
    sbar0 = tuple(jnp.zeros(s.shape, s.dtype) for s in shapes[:5])

    def chunk_step(carry, y_c):
        def one(carry2, _):
            lp, mu, sg, sbar, first = carry2
            G1, Gy, Gy2, X, Xd, ll = stats_fn(y_c, lp, mu, sg)
            s_c = tuple(v / Tc for v in (G1, Gy, Gy2, X, Xd))
            sbar = tuple(jnp.where(first, a, (1.0 - f) * b + f * a)
                         for a, b in zip(s_c, sbar))
            lp2, mu2, sg2 = m_step(sbar)
            return (lp2, mu2, sg2, sbar, jnp.asarray(False)), ll

        carry, lls = jax.lax.scan(one, carry, None, length=inner_steps)
        lp, mu, sg, sbar, first = carry
        return carry, (lp, mu, sg, lls[0])   # predictive (first-pass) ll

    init = (lp0, mu0, sg0, sbar0, jnp.asarray(True))
    (lp_f, mu_f, sg_f, sbar_f, _), traj = jax.lax.scan(
        chunk_step, init, y_blocks)
    return traj, sbar_f


def track_drift(templates, y, *, chunk: int = 32768, forget: float = 0.3,
                inner_steps: int = 1, fb_mode: str | None = None,
                block: int | None = None, callback=None,
                device_loop: bool | None = None) -> DriftTrack:
    """Track drifting templates through `y` with online EM.

    templates: the starting HMMTemplateModel (e.g. from train_model on a
    prefix, or an upstream template file); y: (T,) signal. Chunks are a
    fixed grid of `chunk` samples (the decode windows of decode_tracked);
    a tail chunk too short for meaningful statistics (< max(4K, 256))
    inherits the previous parameters instead of updating. inner_steps > 1
    re-blends each chunk that many times (sharper per-chunk adaptation,
    shorter memory). callback(c, lp, mu, sigma, ll) observes each update.

    device_loop (None = auto: on for accelerator backends without a
    callback) runs the full-chunk sequence as ONE compiled lax.scan
    program (_track_scan) — same update, no per-chunk host round trips;
    the host loop remains for CPU, callbacks, and the ragged tail.

    Training statistics use the non-overlap topology (the reference's
    training space, src/baumwelch.jl:311); the decode topology of the
    returned trajectory follows templates.allow_overlaps.
    """
    from ..models.api import HMMTemplateModel  # noqa: F401  (docs only)

    y = np.asarray(y)
    if y.ndim != 1:
        raise ValueError("track_drift takes a (T,) trace")
    K = templates.K
    N = templates.n_neurons
    if N == 0:
        raise ValueError("track_drift needs at least one template")
    if not 0.0 < forget <= 1.0:
        raise ValueError("forget must be in (0, 1]")
    T = y.shape[0]
    chunk = int(min(chunk, T))
    if chunk < 2:
        raise ValueError("chunk must be >= 2")

    ss = build_state_space(N, K, False)
    tables = EMTables.build(ss)
    dtype = jnp.zeros(0).dtype
    y_dev = jnp.asarray(y, dtype)

    bounds = [(s, min(s + chunk, T)) for s in range(0, T, chunk)]
    min_stats = max(4 * K, 256)

    lp_c = jnp.asarray(templates.lp, dtype)
    mu_c = jnp.asarray(templates.mu, dtype)
    sg_c = jnp.asarray(templates.sigma, dtype)

    sbar = None                     # host float64 blended statistics
    lp_out = np.empty((len(bounds), N))
    mu_out = np.empty((len(bounds), K, N))
    sg_out = np.empty(len(bounds))
    lls = np.empty(len(bounds))

    n_full = T // chunk
    use_device = (device_loop if device_loop is not None
                  else (jax.default_backend() != "cpu"
                        and callback is None))
    start = 0
    if use_device and n_full >= 2:
        if fb_mode is None:
            mode, blk = _auto_fb_mode(K, N, chunk)
        else:
            mode, blk = fb_mode, (block if block is not None else 256)
        if block is not None:
            blk = block
        (lp_t, mu_t, sg_t, ll_t), sbar_f = _track_scan(
            y_dev[: n_full * chunk].reshape(n_full, chunk), lp_c, mu_c,
            sg_c, forget, tables, K=K, fb_mode=mode, block=blk,
            inner_steps=max(1, inner_steps), kind="sc")
        lp_out[:n_full] = np.asarray(lp_t)
        mu_out[:n_full] = np.asarray(mu_t)
        sg_out[:n_full] = np.asarray(sg_t)
        lls[:n_full] = np.asarray(ll_t)
        lp_c, mu_c, sg_c = lp_t[-1], mu_t[-1], sg_t[-1]
        sbar = [np.asarray(v, np.float64) for v in sbar_f]
        start = n_full

    for c, (s, e) in enumerate(bounds):
        if c < start:
            continue
        Tc = e - s
        if Tc < min_stats and c > 0:
            # tail too short to estimate from; carry the parameters
            lp_out[c], mu_out[c], sg_out[c] = lp_out[c - 1], mu_out[c - 1], sg_out[c - 1]
            lls[c] = np.nan
            continue
        if fb_mode is None:
            mode, blk = _auto_fb_mode(K, N, Tc)
        else:
            mode, blk = fb_mode, (block if block is not None else 256)
        if block is not None:
            blk = block
        ll_c = None
        for _ in range(max(1, inner_steps)):
            G1, Gy, Gy2, X, Xd, ll = em_chunk_stats(
                y_dev[s:e], lp_c, mu_c, sg_c, tables, K=K, fb_mode=mode,
                block=blk)
            if ll_c is None:
                ll_c = float(ll)    # predictive ll (pre-update params)
            s_c = [np.asarray(v, np.float64) / Tc
                   for v in (G1, Gy, Gy2, X, Xd)]
            if sbar is None:
                sbar = s_c
            else:
                sbar = [(1.0 - forget) * a + forget * b
                        for a, b in zip(sbar, s_c)]
            lp_new, mu_new, sg_new = _m_step_from_stats(
                jnp.asarray(sbar[0], dtype), jnp.asarray(sbar[1], dtype),
                jnp.asarray(sbar[2], dtype),
                jnp.log(jnp.asarray(sbar[3], dtype)),
                jnp.log(jnp.asarray(sbar[4], dtype)),
                tables.states, dtype, K, N)
            lp_c, mu_c, sg_c = lp_new, mu_new, sg_new
        lp_out[c] = np.asarray(lp_c)
        mu_out[c] = np.asarray(mu_c)
        sg_out[c] = float(sg_c)
        lls[c] = ll_c
        if callback is not None:
            callback(c, lp_out[c], mu_out[c], sg_out[c], lls[c])
    return DriftTrack(lp=lp_out, mu=mu_out, sigma=sg_out, lls=lls,
                      bounds=bounds, chunk=chunk, forget=forget,
                      allow_overlaps=templates.allow_overlaps)


def track_drift_batched(templates, ys, *, chunk: int = 32768,
                        forget: float = 0.3, inner_steps: int = 1,
                        fb_mode: str | None = None,
                        block: int | None = None,
                        device_loop: bool | None = None
                        ) -> list[DriftTrack]:
    """Independent per-channel drift tracks over a (C, T) batch against
    the shared starting templates — the DP axis of the adaptive
    pipeline (CLI --adaptive --channels all). The full-chunk online-EM
    scans of ALL channels run as ONE vmapped device program
    (_track_scan over the channel axis); ragged tails take the same
    host update as track_drift. Per-channel independence: the result
    equals [track_drift(templates, ys[c]) for c] (tested)."""
    ys = np.asarray(ys)
    if ys.ndim != 2:
        raise ValueError("track_drift_batched takes a (C, T) batch")
    C, T = ys.shape
    K = templates.K
    N = templates.n_neurons
    if N == 0:
        raise ValueError("track_drift_batched needs at least one "
                         "template")
    chunk = int(min(chunk, T))
    n_full = T // chunk
    use_device = (device_loop if device_loop is not None
                  else jax.default_backend() != "cpu")
    if not use_device or n_full < 2:
        return [track_drift(templates, ys[c], chunk=chunk, forget=forget,
                            inner_steps=inner_steps, fb_mode=fb_mode,
                            block=block, device_loop=device_loop)
                for c in range(C)]

    ss = build_state_space(N, K, False)
    tables = EMTables.build(ss)
    dtype = jnp.zeros(0).dtype
    if fb_mode is None:
        mode, blk = _auto_fb_mode(K, N, chunk)
    else:
        mode, blk = fb_mode, (block if block is not None else 256)
    if block is not None:
        blk = block
    lp0 = jnp.asarray(templates.lp, dtype)
    mu0 = jnp.asarray(templates.mu, dtype)
    sg0 = jnp.asarray(templates.sigma, dtype)
    yb = jnp.asarray(ys[:, : n_full * chunk], dtype).reshape(
        C, n_full, chunk)
    run = partial(_track_scan, K=K, fb_mode=mode, block=blk,
                  inner_steps=max(1, inner_steps), kind="sc")
    (lp_t, mu_t, sg_t, ll_t), sbar_f = jax.vmap(
        lambda yy: run(yy, lp0, mu0, sg0, forget, tables))(yb)

    bounds = [(s, min(s + chunk, T)) for s in range(0, T, chunk)]
    min_stats = max(4 * K, 256)
    tracks = []
    for c in range(C):
        lp_out = np.empty((len(bounds), N))
        mu_out = np.empty((len(bounds), K, N))
        sg_out = np.empty(len(bounds))
        lls = np.empty(len(bounds))
        lp_out[:n_full] = np.asarray(lp_t[c])
        mu_out[:n_full] = np.asarray(mu_t[c])
        sg_out[:n_full] = np.asarray(sg_t[c])
        lls[:n_full] = np.asarray(ll_t[c])
        if len(bounds) > n_full:                      # ragged tail chunk
            s, e = bounds[-1]
            Tc = e - s
            if Tc < min_stats:
                lp_out[-1], mu_out[-1], sg_out[-1] = (
                    lp_out[-2], mu_out[-2], sg_out[-2])
                lls[-1] = np.nan
            else:
                if fb_mode is None:
                    mode_t, blk_t = _auto_fb_mode(K, N, Tc)
                else:
                    mode_t, blk_t = mode, blk
                sbar = [np.asarray(v[c], np.float64) for v in sbar_f]
                lp_c = jnp.asarray(lp_out[n_full - 1], dtype)
                mu_c = jnp.asarray(mu_out[n_full - 1], dtype)
                sg_c = jnp.asarray(sg_out[n_full - 1], dtype)
                ll_c = None
                for _ in range(max(1, inner_steps)):
                    G1, Gy, Gy2, X, Xd, ll = em_chunk_stats(
                        jnp.asarray(ys[c, s:e], dtype), lp_c, mu_c, sg_c,
                        tables, K=K, fb_mode=mode_t, block=blk_t)
                    if ll_c is None:
                        ll_c = float(ll)
                    s_c = [np.asarray(v, np.float64) / Tc
                           for v in (G1, Gy, Gy2, X, Xd)]
                    sbar = [(1.0 - forget) * a + forget * b
                            for a, b in zip(sbar, s_c)]
                    lp_c, mu_c, sg_c = _m_step_from_stats(
                        jnp.asarray(sbar[0], dtype),
                        jnp.asarray(sbar[1], dtype),
                        jnp.asarray(sbar[2], dtype),
                        jnp.log(jnp.asarray(sbar[3], dtype)),
                        jnp.log(jnp.asarray(sbar[4], dtype)),
                        tables.states, dtype, K, N)
                lp_out[-1] = np.asarray(lp_c)
                mu_out[-1] = np.asarray(mu_c)
                sg_out[-1] = float(sg_c)
                lls[-1] = ll_c
        tracks.append(DriftTrack(
            lp=lp_out, mu=mu_out, sigma=sg_out, lls=lls, bounds=bounds,
            chunk=chunk, forget=forget,
            allow_overlaps=templates.allow_overlaps))
    return tracks


@partial(jax.jit, static_argnames=("L", "H", "overlaps"))
def _tracked_overlap_save(y, lp_all, mu_all, sg_all, *, L, H, overlaps):
    """Overlap-save decode with PER-WINDOW parameters: window b decodes
    with the templates adapted to its span. Window build, all decodes,
    seam snap, and stitch run as one device program (the
    parallel/overlap_save._ring_overlap_save_impl structure).

    Block engine: on a TPU backend the N=2 overlap topology uses the
    fused multi-block Pallas kernel with PER-LANE parameters
    (ops/pallas_viterbi_mb — windows ride the VPU lanes, so per-window
    parameters are per-lane (1, G) rows; bit-identical labels, tested);
    every other topology/backend uses the vmapped XLA ring scan."""
    from ..ops.ring_viterbi import ring_viterbi_nov, ring_viterbi_ov2
    from ..ops.ring_viterbi_ovn import ring_viterbi_ovn
    from ..parallel.overlap_save import _build_windows, _snap_and_stitch

    K, N = mu_all.shape[1], mu_all.shape[2]
    if not overlaps or N < 2:       # N < 2: no pair columns, nov exact
        engine = ring_viterbi_nov
    elif N == 2:
        engine = ring_viterbi_ov2
    else:
        engine = ring_viterbi_ovn

    dtype = mu_all.dtype
    y = y.astype(dtype)
    T = y.shape[0]
    B = -(-T // L)
    W = L + 2 * H
    S = (1 + N * (K - 1) + (N * (N - 1) // 2) * (K - 1) ** 2
         if overlaps else 1 + N * (K - 1))
    out_dtype = jnp.int16 if S <= 32767 else jnp.int32

    if B == 1 or T < W:
        x = engine(y, lp_all[0], mu_all[0], sg_all[0], silent_start=True,
                   with_ll=False)[0]
        return x.astype(out_dtype), jnp.ones((0,), bool)

    y_win, edge_rows = _build_windows(y, T=T, L=L, H=H, B=B, W=W)
    sil0 = jnp.arange(B) == 0       # forced silent start, block 0 only

    from ..ops.pallas_viterbi_mb import CH, KP
    from ..utils.platform import is_tpu_backend

    if (overlaps and N == 2 and K - 1 <= KP and W % CH == 0
            and is_tpu_backend()):
        from ..ops.pallas_viterbi_mb import ov2_decode_pallas_mb

        xb = ov2_decode_pallas_mb(y_win, lp_all, mu_all, sg_all,
                                  silent_start0=True)
    else:
        xb = jax.vmap(
            lambda yy, s0, lp, mu, sg: engine(yy, lp, mu, sg,
                                              silent_start=s0,
                                              with_ll=False)[0])(
            y_win, sil0, lp_all, mu_all, sg_all)
    x, seam_ok = _snap_and_stitch(xb, T=T, L=L, H=H, B=B,
                                  edge_rows=edge_rows)
    return x.astype(out_dtype), seam_ok


@partial(jax.jit, static_argnames=("L", "H", "overlaps"))
def _tracked_overlap_save_events(y, lp_all, mu_all, sg_all, *, L, H,
                                 overlaps):
    """Tracked decode + sparse event extraction as ONE device program —
    the per-window-parameter mirror of
    core/events._ring_overlap_save_events_impl: only the packed onset
    blob crosses the wire when every seam snapped (the dense labels stay
    on device for the fallback)."""
    from ..core.events import _u8, extract_onsets_packed

    x, seam_ok = _tracked_overlap_save(y, lp_all, mu_all, sg_all, L=L,
                                       H=H, overlaps=overlaps)
    K, N = mu_all.shape[1], mu_all.shape[2]
    packed, counts = extract_onsets_packed(x, N=N, K=K, overlaps=overlaps)
    blob = jnp.concatenate([_u8(packed), _u8(counts),
                            _u8(x[0].astype(jnp.int32)), _u8(seam_ok)])
    return blob, x


def _piecewise_path_ll(y, x, track: DriftTrack, ss) -> float:
    """Reference cumulative-score ll of the stitched path, each step's
    transition + emission increment charged under the parameters of the
    chunk OWNING that step. The reference's ll is the SUM of the running
    prefix T1[x_t, t] over t >= 1 (core/path_score.py), so the prefix is
    carried across chunk boundaries: with constant parameters this
    reduces exactly to path_cumulative_ll (tested)."""
    from ..core.path_score import path_transition_weights
    from ..utils.logmath import HALF_LOG_2PI

    states = np.asarray(ss.states)
    Nn = states.shape[0]
    x = np.asarray(x, np.int64)
    y = np.asarray(y, np.float64)
    K = track.mu.shape[1]
    # silent-start prefix (decode forces x[0] == 0; mirror the fallback)
    if x[0] == 0:
        prefix = 0.0
    else:
        mu0 = track.mu[0]
        sg0 = float(track.sigma[0])
        smu0 = mu0[states, np.arange(Nn)[:, None]].sum(axis=0)
        prefix = float(-HALF_LOG_2PI - np.log(sg0)
                       - (y[0] - smu0[x[0]]) ** 2 / (2.0 * sg0 * sg0))
    total = 0.0
    for c, (s, e) in enumerate(track.bounds):
        lo = max(s, 1)
        if lo >= e:
            continue
        mu_c = track.mu[c]
        sg_c = float(track.sigma[c])
        smu = mu_c[states, np.arange(Nn)[:, None]].sum(axis=0)
        pos = states[:, x[lo - 1 : e]]                   # (N, span+1)
        w = path_transition_weights(pos[:, :-1], pos[:, 1:],
                                    track.lp[c], K)      # (span,)
        em = (-HALF_LOG_2PI - np.log(sg_c)
              - (y[lo:e] - smu[x[lo:e]]) ** 2 / (2.0 * sg_c * sg_c))
        pref = prefix + np.cumsum(w + em)
        total += float(pref.sum())
        prefix = float(pref[-1])
    return total


def _protocol_decode_tracked(track: DriftTrack, y, decoder_for):
    """Sequential per-chunk decode with the reference silence-snap
    protocol (models/api._chunked_decode semantics), each chunk decoded
    under ITS OWN parameters — the tracked decode for recordings too
    short to window (T < chunk + 2H, where a halo window would overrun
    the signal and the one-shot branch would mis-pair the tail's labels
    and parameters). Spans are tiny at these sizes, so the sequential
    engines are cheap."""
    T = len(y)
    x = np.zeros(T, np.int64)
    pos = 0
    for c, (s, e) in enumerate(track.bounds):
        if pos >= e and e < T:
            continue                 # retraction already crossed chunk c
        xc = np.asarray(decoder_for(track.model_at(c))(y[pos:e])[0])
        lo = 0
        if pos > 0:                  # must start from silence
            while lo < len(xc) and xc[lo] > 0:
                lo += 1
        j = e
        k = len(xc)
        if e < T:                    # retract to the last silent state
            while k > lo and xc[k - 1] > 0:
                k -= 1
                j -= 1
            if j <= pos:
                raise RuntimeError(
                    f"chunk [{pos}, {e}) has no silent state to snap "
                    "to; track with a larger chunk")
        x[pos + lo : j] = xc[lo:k]
        pos = j
    return x


def decode_tracked(track: DriftTrack, y, *, H: int | None = None,
                   repair: bool = True, transfer: str = "dense"):
    """Decode `y` with the tracked per-chunk templates in one parallel
    device program (see _tracked_overlap_save). Returns an
    HMMSpikingModel whose template_model is the LAST chunk's model, with
    the usual fast-path extras (`seam_ok`, `seams_repaired`,
    `spike_onsets`) and the piecewise cumulative-score ll.

    transfer="events" fetches only the packed spike-onset events and
    reconstructs the labels exactly on the host (core/events.py) — the
    same lossless ~16x-smaller transfer as the stationary fast path;
    flagged seams fall back to the dense labels automatically.

    Flagged seams (no common silence within +-H) are re-decoded with the
    seam's left-chunk parameters over widening windows
    (parallel/seam_repair.py) — drift across one seam window is at most
    one chunk's worth, the same scale the tracker itself smooths over.
    """
    from ..core.events import _onsets_dense
    from ..models.api import HMMSpikingModel

    if transfer not in ("dense", "events"):
        raise ValueError(f"unknown transfer mode {transfer!r}")

    y = np.asarray(y, np.float64)
    T = y.shape[0]
    B = track.n_chunks
    K = track.mu.shape[1]
    L = track.chunk
    if track.bounds[-1][1] != T or -(-T // L) != B:
        raise ValueError("track does not cover this signal (bounds "
                         f"{track.bounds[-1]} vs T={T})")
    if H is None:
        H = max(4 * K, 64)
    if L < 2 * H:
        raise ValueError(f"chunk={L} < 2H={2 * H}; track with a larger "
                         "chunk (or pass a smaller decode halo H)")

    dtype = jnp.zeros(0).dtype
    N = track.mu.shape[2]
    onsets = None
    if B > 1 and T < L + 2 * H:
        # too short to window but multi-chunk: the one-shot branch would
        # decode the tail with chunk 0's parameters — use the sequential
        # per-chunk protocol instead (seams silence-snapped by
        # construction)
        from ..models.api import _decoder_for

        x = _protocol_decode_tracked(track, y, _decoder_for)
        seam_ok = np.ones(0, bool)
    elif transfer == "events" and B > 1 and T >= L + 2 * H:
        from ..core.events import (_parse_event_blob, labels_from_onsets,
                                   onsets_from_packed)

        blob, x_dense = _tracked_overlap_save_events(
            jnp.asarray(y, dtype), jnp.asarray(track.lp, dtype),
            jnp.asarray(track.mu, dtype), jnp.asarray(track.sigma, dtype),
            L=L, H=H, overlaps=track.allow_overlaps)
        packed, counts, x0, seam_ok = _parse_event_blob(
            np.asarray(blob), T=T, N=N, K=K, B=B)
        x = None
        if seam_ok.all():
            try:
                onsets = onsets_from_packed(packed, counts, K=K)
                x = labels_from_onsets(onsets, x0, T=T, N=N, K=K,
                                       overlaps=track.allow_overlaps)
            except ValueError:
                onsets = None                   # packing cross-check failed
        if x is None:
            # raw-cut seams can splice mid-spike — fetch the dense labels
            # (already computed on device)
            x = np.asarray(x_dense).astype(np.int32)
    else:
        x, seam_ok = _tracked_overlap_save(
            jnp.asarray(y, dtype), jnp.asarray(track.lp, dtype),
            jnp.asarray(track.mu, dtype), jnp.asarray(track.sigma, dtype),
            L=L, H=H, overlaps=track.allow_overlaps)
        x = np.asarray(x)
        seam_ok = np.asarray(seam_ok)

    n_repaired = 0
    if repair and not seam_ok.all():
        from ..parallel.seam_repair import make_window_decoder, repair_seams

        for s in np.nonzero(~seam_ok)[0]:
            dec = make_window_decoder(track.lp[s], track.mu[s],
                                      float(track.sigma[s]),
                                      overlaps=track.allow_overlaps)
            x, _ = repair_seams(y, x, [(int(s) + 1) * L], dec, H=H)
        n_repaired = int((~seam_ok).sum())
        seam_ok = np.ones_like(seam_ok)
        onsets = None                    # labels changed under the repair

    ss = build_state_space(N, K, track.allow_overlaps)
    ll = _piecewise_path_ll(y, x, track, ss)
    model = HMMSpikingModel(track.model_at(B - 1), x, ll, y)
    model.seam_ok = seam_ok
    model.seams_repaired = n_repaired
    model.spike_onsets = (onsets if onsets is not None else
                          _onsets_dense(x, N=N, K=K,
                                        overlaps=track.allow_overlaps))
    model.track = track
    return model


# --------------------------------------------------------------------------
# multi-channel mirror: same online blend, per-channel moments, and the
# per-window decode vmaps the in-graph emission tables (MCTablesDevice)
# alongside each window's adapted (lp, mu (K, N, C), sigmas (C,)).

def track_drift_mc(templates, yc, *, chunk: int = 32768,
                   forget: float = 0.3, inner_steps: int = 1,
                   fb_mode: str | None = None, block: int | None = None,
                   callback=None,
                   device_loop: bool | None = None) -> DriftTrack:
    """Track drifting multi-channel templates through a (T, C) recording
    with online EM — the MC mirror of track_drift (per-channel moment
    statistics, train/em_mc.em_chunk_stats_mc; engine auto-rule
    train/em_mc.auto_fb_mode_mc per chunk length; device_loop runs the
    full-chunk sequence as one compiled _track_scan program)."""
    from ..train.em_mc import (auto_fb_mode_mc, em_chunk_stats_mc,
                               _m_step_from_stats_mc)

    yc = np.asarray(yc)
    if yc.ndim != 2:
        raise ValueError("track_drift_mc takes a (T, C) recording")
    K = templates.K
    N = templates.n_neurons
    C = templates.n_channels
    if yc.shape[1] != C:
        raise ValueError(f"recording has {yc.shape[1]} channels but the "
                         f"templates have {C}")
    if N == 0:
        raise ValueError("track_drift_mc needs at least one template")
    if not 0.0 < forget <= 1.0:
        raise ValueError("forget must be in (0, 1]")
    T = yc.shape[0]
    chunk = int(min(chunk, T))
    if chunk < 2:
        raise ValueError("chunk must be >= 2")

    ss = build_state_space(N, K, False)
    tables = EMTables.build(ss)
    dtype = jnp.zeros(0).dtype
    yc_dev = jnp.asarray(yc, dtype)

    bounds = [(s, min(s + chunk, T)) for s in range(0, T, chunk)]
    min_stats = max(4 * K, 256)

    lp_c = jnp.asarray(templates.lp, dtype)
    mu_c = jnp.asarray(templates.mu, dtype)
    sg_c = jnp.asarray(templates.sigmas, dtype)

    sbar = None
    lp_out = np.empty((len(bounds), N))
    mu_out = np.empty((len(bounds), K, N, C))
    sg_out = np.empty((len(bounds), C))
    lls = np.empty(len(bounds))

    n_full = T // chunk
    use_device = (device_loop if device_loop is not None
                  else (jax.default_backend() != "cpu"
                        and callback is None))
    start = 0
    if use_device and n_full >= 2:
        mode = fb_mode if fb_mode is not None else auto_fb_mode_mc(
            chunk, K, N, C, block if block is not None else 2048)
        blk = block if block is not None else 2048
        (lp_t, mu_t, sg_t, ll_t), sbar_f = _track_scan(
            yc_dev[: n_full * chunk].reshape(n_full, chunk, C), lp_c,
            mu_c, sg_c, forget, tables, K=K, fb_mode=mode, block=blk,
            inner_steps=max(1, inner_steps), kind="mc")
        lp_out[:n_full] = np.asarray(lp_t)
        mu_out[:n_full] = np.asarray(mu_t)
        sg_out[:n_full] = np.asarray(sg_t)
        lls[:n_full] = np.asarray(ll_t)
        lp_c, mu_c, sg_c = lp_t[-1], mu_t[-1], sg_t[-1]
        sbar = [np.asarray(v, np.float64) for v in sbar_f]
        start = n_full

    for c, (s, e) in enumerate(bounds):
        if c < start:
            continue
        Tc = e - s
        if Tc < min_stats and c > 0:
            lp_out[c], mu_out[c], sg_out[c] = (lp_out[c - 1],
                                               mu_out[c - 1],
                                               sg_out[c - 1])
            lls[c] = np.nan
            continue
        mode = fb_mode if fb_mode is not None else auto_fb_mode_mc(
            Tc, K, N, C, block if block is not None else 2048)
        blk = block if block is not None else 2048
        ll_c = None
        for _ in range(max(1, inner_steps)):
            G1, Gy, Gy2, X, Xd, ll = em_chunk_stats_mc(
                yc_dev[s:e], lp_c, mu_c, sg_c, tables, K=K, fb_mode=mode,
                block=blk)
            if ll_c is None:
                ll_c = float(ll)
            s_c = [np.asarray(v, np.float64) / Tc
                   for v in (G1, Gy, Gy2, X, Xd)]
            if sbar is None:
                sbar = s_c
            else:
                sbar = [(1.0 - forget) * a + forget * b
                        for a, b in zip(sbar, s_c)]
            lp_new, mu_new, sg_new = _m_step_from_stats_mc(
                jnp.asarray(sbar[0], dtype), jnp.asarray(sbar[1], dtype),
                jnp.asarray(sbar[2], dtype),
                jnp.log(jnp.asarray(sbar[3], dtype)),
                jnp.log(jnp.asarray(sbar[4], dtype)), dtype, K, N, C)
            lp_c, mu_c, sg_c = lp_new, mu_new, sg_new
        lp_out[c] = np.asarray(lp_c)
        mu_out[c] = np.asarray(mu_c)
        sg_out[c] = np.asarray(sg_c)
        lls[c] = ll_c
        if callback is not None:
            callback(c, lp_out[c], mu_out[c], sg_out[c], lls[c])
    return DriftTrack(lp=lp_out, mu=mu_out, sigma=sg_out, lls=lls,
                      bounds=bounds, chunk=chunk, forget=forget,
                      allow_overlaps=templates.allow_overlaps)


def _mc_win_engine(overlaps: bool, N: int):
    """Per-window MC decode closure over the in-graph tables: the scan
    cores (ops/ring_viterbi_mc) take (es, d) streams plus energy tables,
    all computable from tracer (mu, sigmas) via MCTablesDevice."""
    from ..core.emission_mc import MCTablesDevice, mc_streams
    from ..ops.ring_viterbi_mc import (_nov_mc_scan, _ov2_mc_scan,
                                       _ovn_mc_scan)

    if not overlaps or N < 2:
        def one(yw, lp, mu, sg, s0, dtype):
            tb = MCTablesDevice(mu, sg, dtype)
            es, d = mc_streams(yw, tb, dtype=dtype)
            return _nov_mc_scan(es, d, lp, tb.c1, silent_start=s0,
                                with_ll=False)[0]
    elif N == 2:
        def one(yw, lp, mu, sg, s0, dtype):
            tb = MCTablesDevice(mu, sg, dtype)
            es, d = mc_streams(yw, tb, dtype=dtype)
            return _ov2_mc_scan(es, d, lp, tb.c1, tb.x2_01,
                                silent_start=s0, with_ll=False)[0]
    else:
        def one(yw, lp, mu, sg, s0, dtype):
            tb = MCTablesDevice(mu, sg, dtype)
            es, d = mc_streams(yw, tb, dtype=dtype)
            return _ovn_mc_scan(es, d, lp, tb.c1, tb.c2_stack,
                                silent_start=s0, with_ll=False)[0]
    return one


@partial(jax.jit, static_argnames=("L", "H", "overlaps"))
def _tracked_overlap_save_mc(yc, lp_all, mu_all, sg_all, *, L, H,
                             overlaps):
    """MC overlap-save decode with PER-WINDOW parameters — the
    _tracked_overlap_save structure over (T, C) recordings: raw channel
    halo windows, per-window in-graph emission tables, one stitch."""
    from ..parallel.overlap_save import (_build_windows_arrays,
                                         _snap_and_stitch, _edge_rows)

    K, N, C = mu_all.shape[1], mu_all.shape[2], mu_all.shape[3]
    dtype = mu_all.dtype
    yc = yc.astype(dtype)
    T = yc.shape[0]
    B = -(-T // L)
    W = L + 2 * H
    S = (1 + N * (K - 1) + (N * (N - 1) // 2) * (K - 1) ** 2
         if overlaps else 1 + N * (K - 1))
    out_dtype = jnp.int16 if S <= 32767 else jnp.int32
    one = _mc_win_engine(overlaps, N)

    if B == 1 or T < W:
        x = one(yc, lp_all[0], mu_all[0], sg_all[0], True, dtype)
        return x.astype(out_dtype), jnp.ones((0,), bool)

    yw = jax.vmap(partial(_build_windows_arrays, T=T, L=L, H=H, B=B,
                          W=W))(jnp.transpose(yc, (1, 0)))
    y_win = jnp.transpose(yw, (1, 2, 0))                 # (B, W, C)
    sil0 = jnp.arange(B) == 0
    xb = jax.vmap(
        lambda yy, lp, mu, sg, s0: one(yy, lp, mu, sg, s0, dtype))(
        y_win, lp_all, mu_all, sg_all, sil0)
    x, seam_ok = _snap_and_stitch(xb, T=T, L=L, H=H, B=B,
                                  edge_rows=_edge_rows(T, L, H, B, W))
    return x.astype(out_dtype), seam_ok


@partial(jax.jit, static_argnames=("L", "H", "overlaps"))
def _tracked_overlap_save_mc_events(yc, lp_all, mu_all, sg_all, *, L, H,
                                    overlaps):
    """MC tracked decode + sparse event extraction as one program (the
    _tracked_overlap_save_events mirror over (T, C) recordings)."""
    from ..core.events import _u8, extract_onsets_packed

    x, seam_ok = _tracked_overlap_save_mc(yc, lp_all, mu_all, sg_all,
                                          L=L, H=H, overlaps=overlaps)
    K, N = mu_all.shape[1], mu_all.shape[2]
    packed, counts = extract_onsets_packed(x, N=N, K=K, overlaps=overlaps)
    blob = jnp.concatenate([_u8(packed), _u8(counts),
                            _u8(x[0].astype(jnp.int32)), _u8(seam_ok)])
    return blob, x


def _piecewise_path_ll_mc(yc, x, track: DriftTrack, ss) -> float:
    """MC mirror of _piecewise_path_ll: per-channel Gaussian emission
    sums, each step charged under its owning chunk's parameters, the
    running prefix carried across chunk boundaries."""
    from ..core.path_score import path_transition_weights
    from ..utils.logmath import HALF_LOG_2PI

    states = np.asarray(ss.states)
    Nn = states.shape[0]
    x = np.asarray(x, np.int64)
    yc = np.asarray(yc, np.float64)
    K = track.mu.shape[1]

    def em_rows(c, idx_t, idx_x):
        mu_c = track.mu[c]
        sg_c = np.asarray(track.sigma[c], np.float64)    # (C,)
        smu = mu_c[states, np.arange(Nn)[:, None], :].sum(axis=0)  # (S, C)
        dev = yc[idx_t] - smu[idx_x]                     # (n, C)
        return np.sum(-HALF_LOG_2PI - np.log(sg_c)
                      - dev * dev / (2.0 * sg_c * sg_c), axis=-1)

    if x[0] == 0:
        prefix = 0.0
    else:
        prefix = float(em_rows(0, np.array([0]), np.array([x[0]]))[0])
    total = 0.0
    for c, (s, e) in enumerate(track.bounds):
        lo = max(s, 1)
        if lo >= e:
            continue
        pos = states[:, x[lo - 1 : e]]
        w = path_transition_weights(pos[:, :-1], pos[:, 1:],
                                    track.lp[c], K)
        em = em_rows(c, np.arange(lo, e), x[lo:e])
        pref = prefix + np.cumsum(w + em)
        total += float(pref.sum())
        prefix = float(pref[-1])
    return total


def decode_tracked_mc(track: DriftTrack, yc, *, H: int | None = None,
                      repair: bool = True, transfer: str = "dense"):
    """Decode a (T, C) recording with the tracked per-chunk MC templates
    in one parallel device program — the MC mirror of decode_tracked
    (same seam protocol; flagged seams re-decoded with the seam's
    left-chunk parameters; transfer="events" fetches the packed onset
    blob instead of the dense labels)."""
    from ..core.events import _onsets_dense
    from ..models.api import HMMSpikingModel

    if transfer not in ("dense", "events"):
        raise ValueError(f"unknown transfer mode {transfer!r}")

    yc = np.asarray(yc, np.float64)
    if yc.ndim != 2:
        raise ValueError("decode_tracked_mc takes a (T, C) recording")
    T = yc.shape[0]
    B = track.n_chunks
    K = track.mu.shape[1]
    N = track.mu.shape[2]
    L = track.chunk
    if not track.is_mc:
        raise ValueError("single-channel track: use decode_tracked")
    if track.bounds[-1][1] != T or -(-T // L) != B:
        raise ValueError("track does not cover this signal (bounds "
                         f"{track.bounds[-1]} vs T={T})")
    if H is None:
        H = max(4 * K, 64)
    if L < 2 * H:
        raise ValueError(f"chunk={L} < 2H={2 * H}; track with a larger "
                         "chunk (or pass a smaller decode halo H)")

    dtype = jnp.zeros(0).dtype
    onsets = None
    if B > 1 and T < L + 2 * H:
        # same short-signal rule as decode_tracked: sequential per-chunk
        # protocol so the tail keeps its own chunk's parameters
        from ..models.multichannel import _mc_decoder_for

        x = _protocol_decode_tracked(track, yc, _mc_decoder_for)
        seam_ok = np.ones(0, bool)
    elif transfer == "events" and B > 1 and T >= L + 2 * H:
        from ..core.events import (_parse_event_blob, labels_from_onsets,
                                   onsets_from_packed)

        blob, x_dense = _tracked_overlap_save_mc_events(
            jnp.asarray(yc, dtype), jnp.asarray(track.lp, dtype),
            jnp.asarray(track.mu, dtype), jnp.asarray(track.sigma, dtype),
            L=L, H=H, overlaps=track.allow_overlaps)
        packed, counts, x0, seam_ok = _parse_event_blob(
            np.asarray(blob), T=T, N=N, K=K, B=B)
        x = None
        if seam_ok.all():
            try:
                onsets = onsets_from_packed(packed, counts, K=K)
                x = labels_from_onsets(onsets, x0, T=T, N=N, K=K,
                                       overlaps=track.allow_overlaps)
            except ValueError:
                onsets = None
        if x is None:
            x = np.asarray(x_dense).astype(np.int32)
    else:
        x, seam_ok = _tracked_overlap_save_mc(
            jnp.asarray(yc, dtype), jnp.asarray(track.lp, dtype),
            jnp.asarray(track.mu, dtype), jnp.asarray(track.sigma, dtype),
            L=L, H=H, overlaps=track.allow_overlaps)
        x = np.asarray(x)
        seam_ok = np.asarray(seam_ok)

    n_repaired = 0
    if repair and not seam_ok.all():
        from ..models.multichannel import _mc_repair_decoder
        from ..parallel.seam_repair import repair_seams

        for s in np.nonzero(~seam_ok)[0]:
            dec = _mc_repair_decoder(track.model_at(int(s)))
            x, _ = repair_seams(yc, x, [(int(s) + 1) * L], dec, H=H)
        n_repaired = int((~seam_ok).sum())
        seam_ok = np.ones_like(seam_ok)
        onsets = None                    # labels changed under the repair

    ss = build_state_space(N, K, track.allow_overlaps)
    ll = _piecewise_path_ll_mc(yc, x, track, ss)
    model = HMMSpikingModel(track.model_at(B - 1), x, ll, yc)
    model.seam_ok = seam_ok
    model.seams_repaired = n_repaired
    model.spike_onsets = (onsets if onsets is not None else
                          _onsets_dense(x, N=N, K=K,
                                        overlaps=track.allow_overlaps))
    model.track = track
    return model
