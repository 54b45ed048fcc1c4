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
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from hmmspikesorter_tpu.core.emission import state_means
    from hmmspikesorter_tpu.core.state_space import build_state_space
    from hmmspikesorter_tpu import native
    from hmmspikesorter_tpu.ops.ring_viterbi import ring_block_decoder
    from hmmspikesorter_tpu.parallel.overlap_save import (
        overlap_save_decode_long)
    from hmmspikesorter_tpu.data.synthetic import (
        create_signal, create_spike_template)

    N, K, sigma = 2, 60, 0.3
    T = 1 << 20
    L, H, BPC = 8192, 512, 16

    rng = np.random.default_rng(1234)
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.003, 0.001])
    y, _ = create_signal(T, sigma, pp, temps, rng=rng)

    ss = build_state_space(N, K, True)          # overlaps on: S = 3600
    lp = np.log(pp)
    in_idx_h, in_w_h = ss.in_table(lp)
    dev = jax.devices()[0]
    dtype = jnp.float32
    in_idx = jax.device_put(jnp.asarray(in_idx_h), dev)
    in_w = jax.device_put(jnp.asarray(in_w_h, dtype), dev)
    smu = jax.device_put(
        state_means(jnp.asarray(ss.states), jnp.asarray(temps, dtype)), dev)

    # --- TPU decode: ring-structured engine (gather-free fast path) under
    # the overlap-save driver (warmup compiles; then timed runs)
    decoder = ring_block_decoder(jnp.asarray(lp, dtype),
                                 jnp.asarray(temps, dtype), sigma,
                                 overlaps=True)

    def run():
        return overlap_save_decode_long(y, in_idx, in_w, smu, sigma,
                                        L=L, H=H, blocks_per_call=BPC,
                                        block_decoder=decoder)

    x_tpu, seam_ok = run()                      # warmup + correctness output
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    tpu_sps = T / min(times)

    # --- CPU baseline (reference loop semantics, -O3, single thread)
    Tc = 1 << 17
    t0 = time.perf_counter()
    x_cpu, _ = native.viterbi(y[:Tc], ss, lp, temps, sigma)
    cpu_elapsed = time.perf_counter() - t0
    cpu_sps = Tc / cpu_elapsed

    # --- label agreement on the CPU slice (f32 TPU vs f64 CPU, plus seam
    # protocol differences; spikes are what matters)
    agree = float((x_tpu[:Tc] == x_cpu).mean())

    print(json.dumps({
        "metric": "viterbi_decode_samples_per_s_per_chip",
        "value": round(tpu_sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(tpu_sps / cpu_sps, 2),
        "baseline_cpu_samples_per_s": round(cpu_sps, 1),
        "label_agreement_vs_reference_semantics": round(agree, 6),
        "seams_ok_frac": float(np.mean(seam_ok)),
        "config": "N=2 K=60 overlaps S=3600 T=2^20 f32 L=8192 H=512 ring",
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
