"""Device-time phase breakdown of the production decode (SURVEY.md §5.1).

jax.profiler's Perfetto capture hangs through the tunneled axon backend
(BENCHMARKS.md notes), so this is the next-best deliverable: each phase of
the overlap-save decode is timed device-side with the amortized-scalar
probe (queue R calls, materialize a 4-byte checksum, subtract the 1-call
latency), isolating compute from tunnel transfer:

  phase 1  emission+forward max-plus scan (flags production)
  phase 2  backtrace (serial label chase over the flags)
  phase 3  seam snap + stitch (pure gathers/wheres)
  whole    the fused production program (ring_overlap_save)

Run on the TPU:  python benchmarks/phases.py            (one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _amortized(fn, arg, R=6):
    """Seconds per call, device-side (transfer excluded by subtraction)."""
    np.asarray(fn(arg))                        # compile + warm
    t0 = time.perf_counter()
    np.asarray(fn(arg))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = [fn(arg) for _ in range(R)]
    for o in outs:
        np.asarray(o)
    tR = time.perf_counter() - t0
    return max((tR - t1) / (R - 1), 1e-9), t1


def main():
    import jax
    import jax.numpy as jnp

    from hmmspikesorter_tpu.data.synthetic import (create_signal_fast,
                                                   create_spike_template)
    from hmmspikesorter_tpu.ops.ring_viterbi import ring_viterbi_ov2
    from hmmspikesorter_tpu.parallel.overlap_save import ring_overlap_save

    N, K, sigma = 2, 60, 0.3
    B, W, L, H = 256, 8704, 8192, 256
    T = B * L
    rng = np.random.default_rng(1234)
    temps = np.stack([create_spike_template(K, 3.0, 0.8, 0.2),
                      create_spike_template(K, 4.0, 0.3, 0.2)], axis=1)
    pp = np.array([0.003, 0.001])
    y, _ = create_signal_fast(T, sigma, pp, temps, rng=rng)
    lp_d = jnp.asarray(np.log(pp), jnp.float32)
    mu_d = jnp.asarray(temps, jnp.float32)
    y_d = jax.device_put(jnp.asarray(y, jnp.float32))
    y_win = jax.device_put(
        jnp.asarray(np.lib.stride_tricks.sliding_window_view(
            np.pad(y, (H, W)), W)[::L][:B], jnp.float32))
    sil = jnp.arange(B) == 0

    # forward-only: run the engine but sum the SCORES path (no backtrace
    # consumed) — XLA dead-code-eliminates the backtrace when only ll-free
    # forward outputs are used, so probe via the decode with and without
    # the backtrace consumed
    dec = jax.jit(lambda yw: jnp.sum(jax.vmap(
        lambda yy, s0: ring_viterbi_ov2(yy, lp_d, mu_d, jnp.float32(sigma),
                                        silent_start=s0, with_ll=False)[0]
    )(yw, sil).astype(jnp.int32)))

    def whole_fn(engine):
        return jax.jit(lambda yy: jnp.sum(ring_overlap_save(
            yy, lp_d, mu_d, sigma, L=L, H=H, overlaps=True,
            block_engine=engine)[0].astype(jnp.int32)))

    t_dec, lat_dec = _amortized(dec, y_win)
    t_ring, _ = _amortized(whole_fn("ring"), y_d)
    t_pal, lat_pal = _amortized(whole_fn("pallas"), y_d)
    # stitch/window overhead isolated against the SAME (ring) block engine
    t_stitch = max(t_ring - t_dec, 0.0)

    print(json.dumps({
        "metric": "decode_phase_breakdown_device_s",
        "config": f"N={N} K={K} S=3600 T=2^21 f32 B={B} W={W}",
        "block_decode_ring_fwd_plus_backtrace_s": round(t_dec, 4),
        "window_build_seam_stitch_s": round(t_stitch, 4),
        "whole_program_ring_s": round(t_ring, 4),
        "whole_program_pallas_s": round(t_pal, 4),
        "device_samples_per_s_pallas": round(T / t_pal, 1),
        "one_call_wall_s_incl_transfer": round(lat_pal, 4),
        "transfer_and_latency_s": round(max(lat_pal - t_pal, 0.0), 4),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
