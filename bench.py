"""Benchmark: Viterbi decode samples/s on one TPU chip vs the single-thread
CPU reference curve (BASELINE.json headline metric).

Config: the production CLI decode problem — 2 templates, K=60, pairwise
overlaps ON (3600 combined states, the state space src/hmmsort.jl:57 decodes
with), 2^20 samples at sigma=0.3. TPU path: overlap-save parallel decode
(halo blocks + silence-snapped seams — the TPU-native analog of the
reference's chunked decoder, src/fit.jl:11-42). Baseline: the native -O3
C++ engine implementing the reference's exact loop semantics
(hmmspikesorter_tpu/native/ref_engine.cpp), measured on a slice and scaled —
the stand-in for the Julia reference (no Julia runtime in this image;
BASELINE.md).

Prints one JSON line:
  {"metric": ..., "value": tpu samples/s, "unit": "samples/s",
   "vs_baseline": tpu/cpu speedup, ...extras}
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from hmmspikesorter_tpu.core.emission import state_means
    from hmmspikesorter_tpu.core.state_space import build_state_space
    from hmmspikesorter_tpu import native
    from hmmspikesorter_tpu.parallel.overlap_save import ring_overlap_save
    from hmmspikesorter_tpu.data.synthetic import (
        create_signal_fast, create_spike_template)

    N, K, sigma = 2, 60, 0.3
    T = 1 << 21
    L, H = 8192, 256             # 256 blocks, all in flight in one program

    rng = np.random.default_rng(1234)
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.003, 0.001])
    y, _ = create_signal_fast(T, sigma, pp, temps, rng=rng)

    ss = build_state_space(N, K, True)          # overlaps on: S = 3600
    lp = np.log(pp)
    in_idx_h, in_w_h = ss.in_table(lp)
    dev = jax.devices()[0]
    dtype = jnp.float32
    in_idx = jax.device_put(jnp.asarray(in_idx_h), dev)
    in_w = jax.device_put(jnp.asarray(in_w_h, dtype), dev)
    smu = jax.device_put(
        state_means(jnp.asarray(ss.states), jnp.asarray(temps, dtype)), dev)

    # --- TPU decode: ring-structured engine (gather-free) fully on-device —
    # window gather, vmapped block decodes, seam snap, stitch, AND the
    # packed spike-event extraction are one jitted program; only the
    # ~T/(16K) event blob crosses the wire back (core/events.py), and the
    # full label sequence is reconstructed exactly on the host each
    # iteration (bit-equality vs the dense transfer asserted below)
    from hmmspikesorter_tpu.core.events import (
        _parse_event_blob, _ring_overlap_save_events_impl,
        labels_from_onsets, onsets_from_packed)
    from hmmspikesorter_tpu.parallel.overlap_save import resolve_block_engine

    lp_d = jnp.asarray(lp, dtype)
    mu_d = jnp.asarray(temps, dtype)
    y_d = jax.device_put(jnp.asarray(y, dtype), dev)
    sg_d = jnp.asarray(sigma, dtype)
    be = resolve_block_engine("auto", True, K, N, L + 2 * H)
    Bn = T // L

    def run_ev():
        return _ring_overlap_save_events_impl(y_d, lp_d, mu_d, sg_d, L=L,
                                              H=H, overlaps=True,
                                              block_engine=be)[0]

    def labels_of(blob):
        # np.asarray is the reliable completion barrier on tunneled
        # backends (block_until_ready can return early there)
        pk, cn, x0, ok = _parse_event_blob(np.asarray(blob), T=T, N=N,
                                           K=K, B=Bn)
        x = labels_from_onsets(onsets_from_packed(pk, cn, K=K), x0,
                               T=T, N=N, K=K, overlaps=True)
        return x, ok

    x_tpu, seam_ok = labels_of(run_ev())        # warmup + correctness output
    # dense-transfer cross-check: the sparse reconstruction must be
    # bit-equal to the labels the device computed
    x_dense = np.asarray(ring_overlap_save(y_d, lp_d, mu_d, sigma, L=L,
                                           H=H, overlaps=True)[0])
    assert (x_tpu == x_dense.astype(np.int32)).all(), \
        "event-transfer reconstruction diverged from dense labels"
    # throughput: pipelined two deep — keep two decodes in flight and
    # reconstruct the oldest blob's labels while the device works; every
    # iteration produces the full (T,) label vector on the host. Depth 2
    # (vs 1) hides the blob fetch + ~3.5 ms host reconstruction behind the
    # ~37 ms device program (measured: 43.1 -> 38.4 ms/iter,
    # scripts/probe_headline.py)
    R = 6
    t0 = time.perf_counter()
    q = [run_ev(), run_ev()]
    for _ in range(R - 2):
        q.append(run_ev())
        labels_of(q.pop(0))
    for b in q:
        labels_of(b)
    tpu_sps = R * T / (time.perf_counter() - t0)

    # --- CPU baseline (reference loop semantics, -O3, single thread);
    # best-of-3 to damp noisy-neighbor variance on the shared host
    Tc = 1 << 17
    try:
        cpu_elapsed = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            x_cpu, _ = native.viterbi(y[:Tc], ss, lp, temps, sigma)
            cpu_elapsed = min(cpu_elapsed, time.perf_counter() - t0)
        cpu_sps = Tc / cpu_elapsed
        agree = float((x_tpu[:Tc] == x_cpu).mean())
    except Exception:                            # e.g. no g++ toolchain
        cpu_sps = float("nan")
        agree = float("nan")

    # --- Baum-Welch iterations/s (second BASELINE.json metric): blocked
    # gather-free EM on the training topology (non-overlap), device-chained
    # iterations with one final materialization barrier
    from hmmspikesorter_tpu.train.em import EMTables, em_chain

    Tb = 1 << 19
    ss_tr = build_state_space(N, K, False)
    tables = EMTables.build(ss_tr)
    y_tr = jax.device_put(jnp.asarray(y[:Tb], dtype), dev)
    lp_t = jnp.asarray(lp, dtype)
    mu_t = jnp.asarray(temps, dtype)
    sg_t = dtype(sigma)
    # the production TPU engine: fused Pallas halo-window EM (falls back
    # to the XLA overlap engine off-TPU), iterations chained into ONE
    # compiled program (em_chain — what train_model runs when no per-iter
    # host output is requested), so the tunnel dispatch is paid once
    from hmmspikesorter_tpu.utils.platform import is_tpu_backend
    bw_mode = "overlap_pallas" if is_tpu_backend() else "overlap"
    bw_block = 2048
    iters = 10
    out = em_chain(y_tr, lp_t, mu_t, sg_t, tables, K=K, n_iters=iters,
                   fb_mode=bw_mode, block=bw_block)
    np.asarray(out[0])                          # warmup/compile
    t0 = time.perf_counter()
    l, _, m, s, _ = em_chain(y_tr, lp_t, mu_t, sg_t, tables, K=K,
                             n_iters=iters, fb_mode=bw_mode, block=bw_block)
    np.asarray(l)
    bw_iter_per_s = iters / (time.perf_counter() - t0)

    # native single-thread EM baseline (reference loop semantics,
    # ref_engine.cpp hmmss_em_step): timed on a slice and scaled — EM cost
    # is linear in T (three O(T*E) sweeps), same protocol as the Viterbi
    # baseline above
    try:
        Te = 1 << 17
        cpu_em = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            native.em_step(y[:Te], ss_tr, lp, temps, sigma)
            cpu_em = min(cpu_em, time.perf_counter() - t0)
        bw_baseline_iter_per_s = 1.0 / (cpu_em * (Tb / Te))
        bw_vs_baseline = bw_iter_per_s / bw_baseline_iter_per_s
    except Exception:
        bw_baseline_iter_per_s = float("nan")
        bw_vs_baseline = None

    # --- optional multi-channel extras (BENCH_MC=1): two more compiled
    # programs (~minutes of tunnel compile), so off by default to keep the
    # round-end bench fast; BENCHMARKS.md carries the measured MC numbers
    mc_extras = {}
    if os.environ.get("BENCH_MC") == "1":
        from hmmspikesorter_tpu.parallel.overlap_save import mc_overlap_save
        from hmmspikesorter_tpu.train.em_mc import em_chain_mc
        from hmmspikesorter_tpu.data.synthetic import create_spike_template

        Nm, Cm, Tm = 3, 4, 1 << 19
        t3 = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                       create_spike_template(K, 2.0, 0.5, 0.3),
                       create_spike_template(K, 2.5, 0.6, 0.25)], axis=1)
        rngm = np.random.default_rng(5)
        mu_mc = (t3[:, :, None] * (0.3 + rngm.random((Nm, Cm)))).astype(
            np.float32)
        pp_m = np.array([0.01, 0.005, 0.008])
        sg_m = (0.25 + 0.1 * rngm.random(Cm)).astype(np.float32)
        yc = (sg_m * rngm.standard_normal((Tm, Cm))).astype(np.float32)
        lp_m = np.log(pp_m).astype(np.float32)
        am = (jnp.asarray(yc), jnp.asarray(lp_m), jnp.asarray(mu_mc),
              jnp.asarray(sg_m))
        xm, _ = mc_overlap_save(*am, L=8192, H=256, overlaps=True)
        np.asarray(xm)
        t0 = time.perf_counter()
        xm, _ = mc_overlap_save(*am, L=8192, H=256, overlaps=True)
        np.asarray(xm)
        mc_extras["mc_decode_samples_per_s"] = round(
            Tm / (time.perf_counter() - t0), 1)
        tbl = EMTables.build(build_state_space(Nm, K, False))
        o = em_chain_mc(*am, tbl, K=K, n_iters=5,
                        fb_mode=("overlap_pallas" if is_tpu_backend()
                                 else "overlap"), block=2048)
        np.asarray(o[0])
        t0 = time.perf_counter()
        o = em_chain_mc(*am, tbl, K=K, n_iters=5,
                        fb_mode=("overlap_pallas" if is_tpu_backend()
                                 else "overlap"), block=2048)
        np.asarray(o[0])
        mc_extras["mc_bw_iter_per_s"] = round(
            5 / (time.perf_counter() - t0), 2)
        mc_extras["mc_config"] = f"N={Nm} C={Cm} K={K} T=2^19"

    # --- exact posteriors on the production overlap topology (round 5:
    # the fused ov2 chained-gamma kernel behind --confidence/--qc); one
    # small-compile shape (T=2^19 -> one lane group)
    post_extras = {}
    try:
        from hmmspikesorter_tpu.core.posterior import (
            onset_posteriors_chained)
        from hmmspikesorter_tpu.models.api import HMMTemplateModel

        Tpo = 1 << 19
        tm_po = HMMTemplateModel(temps, sigma, lp, allow_overlaps=True)
        p_po = onset_posteriors_chained(tm_po, np.float32(y[:Tpo]))
        t0 = time.perf_counter()
        p_po = onset_posteriors_chained(tm_po, np.float32(y[:Tpo]))
        post_extras["posterior_exact_samples_per_s"] = round(
            Tpo / (time.perf_counter() - t0), 1)
        from hmmspikesorter_tpu.core.events import _onsets_dense

        dec_on = _onsets_dense(np.asarray(x_tpu[:Tpo]), N=N, K=K,
                               overlaps=True)
        dec_c = np.array([len(o) for o in dec_on], float)
        exp_c = p_po.sum(axis=0)
        post_extras["posterior_count_rel_err"] = round(float(np.max(
            np.abs(exp_c - dec_c) / np.maximum(dec_c, 1.0))), 5)
    except Exception as e:                       # pragma: no cover
        post_extras["posterior_exact_error"] = type(e).__name__

    print(json.dumps({
        "metric": "viterbi_decode_samples_per_s_per_chip",
        **mc_extras,
        **post_extras,
        "value": round(tpu_sps, 1),
        "unit": "samples/s",
        "vs_baseline": (round(tpu_sps / cpu_sps, 2)
                        if cpu_sps == cpu_sps else None),
        "baseline_cpu_samples_per_s": (round(cpu_sps, 1)
                                       if cpu_sps == cpu_sps else None),
        "label_agreement_vs_reference_semantics": round(agree, 6),
        "bw_iter_per_s": round(bw_iter_per_s, 3),
        "bw_baseline_iter_per_s": (round(bw_baseline_iter_per_s, 4)
                                   if bw_baseline_iter_per_s ==
                                   bw_baseline_iter_per_s else None),
        "bw_vs_baseline": (round(bw_vs_baseline, 2)
                           if bw_vs_baseline is not None else None),
        "bw_config": f"N={N} K={K} non-overlap T=2^19 {bw_mode} L={bw_block}",
        "seams_ok_frac": float(np.mean(seam_ok)),
        "config": ("N=2 K=60 overlaps S=3600 T=2^21 f32 L=8192 H=256 "
                   "block_engine=auto(pallas fwd+bt)"),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
